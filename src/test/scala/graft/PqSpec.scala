package graft

import org.apache.spark.sql.functions._
import graft.ext.{Pq, Similarity}

class PqSpec extends SparkSpec {
  import spark.implicits._

  test("encode: argmin L2 per subspace, lowest code wins ties") {
    // two subspaces of 2 dims; subspace 0 has duplicate centroids (tie),
    // subspace 1 has a clear winner at code 1
    val cb = Array(
      Array(Array(1.0, 1.0), Array(1.0, 1.0), Array(9.0, 9.0)),
      Array(Array(0.0, 0.0), Array(5.0, 5.0), Array(-5.0, -5.0)))
    val df = Seq((7L, Seq(1.0, 1.0, 5.0, 4.0))).toDF("vec_id", "embedding")
    val codes = Pq.pqEncode(df, cb).head().getSeq[Int](1)
    assert(codes == Seq(0, 1), s"tie must pick the lowest code: $codes")
  }

  test("exact-reconstruction corpus: ADC ranking equals brute force") {
    // vectors ARE concatenations of codebook entries, so x-hat = x and the
    // ADC cosine estimate is the true cosine — rankings must agree exactly
    val m = 2; val dsub = 2
    val cb = Pq.integerCodebooks(m, 4, dsub)
    val rng = new scala.util.Random(7)
    val rows = (0L until 60L).map { i =>
      val parts = (0 until m).map(j => cb(j)(rng.nextInt(4)))
      (i, parts.flatten.toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("query_emb"))
    val adc = Pq.pqTopK(Pq.pqEncode(corpus, cb), queries, cb, k = 5)
      .select($"query_id", $"rank", $"vec_id", round($"cos", 9).as("cos"))
    val brute = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select($"query_id", $"rank", $"vec_id", round($"cos", 9).as("cos"))
    assert(adc.exceptAll(brute).isEmpty && brute.exceptAll(adc).isEmpty,
      "ADC over exactly-reconstructible vectors must reproduce brute force")
  }

  test("trained PQ: codes in range, cluster-level retrieval over clustered corpus") {
    val rng = new scala.util.Random(42)
    val dim = 16; val nCenters = 8
    val centers = Array.fill(nCenters)(Array.fill(dim)(rng.nextGaussian() * 3))
    val rows = (0L until 400L).map { i =>
      val c = centers((i % nCenters).toInt)
      (i, c.map(_ + rng.nextGaussian() * 0.2).toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding").repartition(4)
    val cb = Pq.trainPqCodebooks(corpus, dim, m = 4, ksub = 8, iters = 3)
    assert(cb.length == 4 && cb.forall(_.length == 8) && cb.forall(_.forall(_.length == 4)))
    val enc = Pq.pqEncode(corpus, cb)
    val bad = enc.filter(exists(col("codes"), c => c < 0 || c >= 8)).count()
    assert(bad == 0, "codes out of [0, ksub)")
    val queries = corpus.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_emb"))
    val approx = Pq.pqTopK(enc, queries, cb, k = 10)
    // Quantization collapses WITHIN-cluster distances (all members of a
    // tight cluster share codes), so id-level recall@10 is meaningless
    // here by design; the correctness claim PQ makes on a separable
    // corpus is CLUSTER-level: every retrieved neighbor belongs to the
    // query's true cluster (cluster id = vec_id % nCenters).
    val wrongCluster = approx
      .filter(pmod(col("vec_id"), lit(nCenters)) =!= pmod(col("query_id"), lit(nCenters)))
      .count()
    assert(wrongCluster == 0, s"$wrongCluster of 50 retrieved neighbors left the query's cluster")
  }

  test("replayable twin: deterministic, k rows per query, rank contract") {
    val rng = new scala.util.Random(3)
    val corpus = (0L until 50L).map(i => (i, Seq.fill(8)(rng.nextGaussian())))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 2)
      .select($"vec_id".as("query_id"), $"embedding".as("query_emb"))
    val a = Pq.pqTopKReplayable(corpus, queries, k = 5, dim = 8, m = 4, ksub = 4).collect()
    val b = Pq.pqTopKReplayable(corpus, queries, k = 5, dim = 8, m = 4, ksub = 4).collect()
    assert(a.toSeq == b.toSeq, "replayable twin must be run-deterministic")
    val byQ = a.groupBy(_.getAs[Any]("query_id"))
    assert(byQ.size == 2 && byQ.values.forall(_.length == 5))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 5),
        "ranks must be 1..k per query")
      val coss = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(coss.zip(coss.tail).forall { case (x, y) => x >= y }, "cos must be non-increasing")
    }
  }

  test("ivf-pq: candidates confined to probed cells, cluster-level retrieval") {
    val rng = new scala.util.Random(9)
    val dim = 16; val nCenters = 6
    val centers = Array.fill(nCenters)(Array.fill(dim)(rng.nextGaussian() * 3))
    val corpus = (0L until 300L).map { i =>
      val c = centers((i % nCenters).toInt)
      (i, c.map(_ + rng.nextGaussian() * 0.2).toSeq)
    }.toDF("vec_id", "embedding").repartition(4)
    val cents = Similarity.trainIvfCentroids(corpus, nlist = 6, iters = 3)
    val cb = Pq.trainPqCodebooks(corpus, dim, m = 4, ksub = 8, iters = 3)
    val queries = corpus.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("query_emb"))
    val got = Pq.ivfPqTopK(corpus, queries, k = 10, cents, cb, nprobe = 2)
    assert(got.groupBy("query_id").count().collect().forall(_.getLong(1) == 10L))
    // tight clusters: every hit must be the query's own cluster
    val wrong = got.filter(pmod(col("vec_id"), lit(nCenters)) =!=
      pmod(col("query_id"), lit(nCenters))).count()
    assert(wrong == 0, s"$wrong cross-cluster hits")
    // run-deterministic
    val a = got.collect().toSeq
    val b = Pq.ivfPqTopK(corpus, queries, k = 10, cents, cb, nprobe = 2).collect().toSeq
    assert(a == b)
  }

  test("shape guards: dim % m, short vectors filtered") {
    intercept[IllegalArgumentException] {
      Pq.pqTopKReplayable(Seq((1L, Seq(1.0))).toDF("vec_id", "embedding"),
        Seq((1L, Seq(1.0))).toDF("query_id", "query_emb"), k = 1, dim = 10, m = 3)
    }
    val cb = Pq.integerCodebooks(2, 2, 2)
    val mixed = Seq((1L, Seq(1.0, 2.0, 3.0, 4.0)), (2L, Seq(1.0, 2.0)))
      .toDF("vec_id", "embedding")
    assert(Pq.pqEncode(mixed, cb).count() == 1, "short vectors are filtered, not crashed on")
  }
}
