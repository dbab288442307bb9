package graft

import graft.ext.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  /** Reference mixed hash (mirrors Sketches.mixHash: Knuth step + murmur3
    * fmix32 finalizer), written with plain 64-bit ops as an independent
    * implementation of the same arithmetic. */
  private def kh(id: Long): Long = {
    var h = ((id % 2147483648L) * 2654435761L) % 4294967296L
    h ^= h >> 16; h = (h * 2246822507L) & 0xffffffffL
    h ^= h >> 13; h = (h * 3266489909L) & 0xffffffffL
    h ^ (h >> 16)
  }

  test("kmvDistinct: kth min hash and estimate match the hand computation") {
    val ids = (1L to 1000L).toDF("id")
    val k = 16
    val r = Sketches.kmvDistinct(ids, "id", k).collect()(0)
    val hashes = (1L to 1000L).map(kh).distinct.sorted
    val kth = hashes(k - 1)
    assert(r.getAs[Long]("n_kept") == k)
    assert(r.getAs[Long]("kth_min_hash") == kth)
    val est = (k - 1).toDouble * 4294967296.0 / kth.toDouble
    assert(r.getAs[Double]("est_distinct") == est)
    // the estimate should be in the right ballpark for n=1000
    assert(math.abs(est - 1000.0) / 1000.0 < 0.6, s"est=$est")
  }

  test("kmvDistinct: exact when distinct count is below k; duplicates ignored") {
    val ids = Seq(1L, 2L, 3L, 2L, 1L, 3L, 3L).toDF("id")
    val r = Sketches.kmvDistinct(ids, "id", 10).collect()(0)
    assert(r.getAs[Long]("n_kept") == 3)
    assert(r.isNullAt(r.fieldIndex("kth_min_hash")))
    assert(r.getAs[Double]("est_distinct") == 3.0)
    // duplicates leave the sketch unchanged
    val clean = Sketches.kmvDistinct(Seq(1L, 2L, 3L).toDF("id"), "id", 10).collect()(0)
    assert(clean.getAs[Double]("est_distinct") == 3.0)
  }

  test("kmvDistinct: invariant to partitioning (merge path ≡ single partition)") {
    val one = Sketches.kmvDistinct((1L to 500L).toDF("id").coalesce(1), "id", 32).collect()(0)
    val many = Sketches.kmvDistinct((1L to 500L).toDF("id").repartition(7), "id", 32).collect()(0)
    assert(one.getAs[Long]("kth_min_hash") == many.getAs[Long]("kth_min_hash"))
    assert(one.getAs[Double]("est_distinct") == many.getAs[Double]("est_distinct"))
  }

  test("hllBucketRank: bucket is the top b bits, rank the suffix zero-run") {
    val b = 8
    val wb = 32 - b
    val df = Seq(7L, 42L, 123456L).toDF("id")
    val (bucket, rank) = Sketches.hllBucketRank(col("id"), b)
    val rows = df.select(col("id"), bucket.as("bucket"), rank.as("rank"))
      .as[(Long, Long, Int)].collect()
    rows.foreach { case (id, bkt, rk) =>
        val h = kh(id)
        val expBkt = h >> wb
        val w = h & ((1L << wb) - 1)
        val expRk = if (w == 0) wb + 1 else wb - (63 - java.lang.Long.numberOfLeadingZeros(w))
        assert(bkt == expBkt, s"id=$id")
        assert(rk == expRk, s"id=$id h=$h w=$w")
      }
    assert(rows.nonEmpty)
  }

  test("hllDistinct: estimate within the published error band, small range exact-ish") {
    val n = 20000
    val est = Sketches.hllDistinct((1L to n.toLong).toDF("id"), "id", 8)
      .collect()(0).getAs[Double]("est_distinct")
    // b=8 → typical relative error 1.04/sqrt(256) ≈ 6.5%; allow 4 sigma
    assert(math.abs(est - n) / n < 0.26, s"est=$est")
    // small-range: linear counting is near-exact for tiny cardinalities
    val small = Sketches.hllDistinct((1L to 10L).toDF("id"), "id", 8)
      .collect()(0).getAs[Double]("est_distinct")
    assert(math.abs(small - 10.0) < 2.0, s"small=$small")
  }

  test("hllRegisters merge: sharded registers combine to the whole-corpus estimate") {
    val all = (1L to 5000L).toDF("id")
    val whole = Sketches.hllDistinct(all, "id", 8).collect()(0).getAs[Double]("est_distinct")
    val sh1 = Sketches.hllRegisters(all.filter($"id" <= 2500), "id", 8)
    val sh2 = Sketches.hllRegisters(all.filter($"id" > 2500), "id", 8)
    val merged = Sketches.hllEstimate(
      sh1.union(sh2).groupBy("bucket").agg(max("rank").as("rank")), 8)
      .collect()(0).getAs[Double]("est_distinct")
    assert(whole == merged, s"$whole vs $merged")
  }

  test("mixHash: column arithmetic agrees with an independent 64-bit implementation") {
    val ids = Seq(0L, 1L, 17L, 65536L, 2147483647L)
    val rows = ids.toDF("id").select(col("id"), Sketches.mixHash(col("id")).as("h"))
      .as[(Long, Long)].collect().toMap
    ids.foreach { id => assert(rows(id) == kh(id), s"id=$id") }
    // stays in the 32-bit range (the overflow-free split-multiply contract)
    assert(rows.values.forall(h => h >= 0 && h < 4294967296L))
  }
}
