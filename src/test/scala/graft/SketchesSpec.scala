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

  /** Independent Karp–Rabin hash + CMS row hash (mirrors
    * TextStats.rollingHash and Sketches.cmsBucketCol). */
  private def krh(s: String): Long =
    s.foldLeft(0L)((h, c) => (h * 257L + c.toLong) % 1000000007L)
  private def cmsBkt(tok: String, r: Int, width: Int): Long =
    ((krh(tok) * (2654435761L + 40503L * r) + 97911L * r + 7L) % 1000000007L) % width

  test("cmsEstimate: never underestimates, and is exact absent collisions") {
    val toks = Seq.fill(30)("alpha") ++ Seq.fill(12)("beta") ++
      Seq.fill(5)("gamma") ++ Seq("delta")
    val df = toks.toDF("tok")
    val exact = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val counters = Sketches.cmsCounters(df, "tok", width = 1024, depth = 4)
    val est = Sketches.cmsEstimate(counters, toks.distinct.toDF("tok"), "tok", 1024, 4)
      .as[(String, Long)].collect().toMap
    // wide sketch, 4 tokens: collisions vanish → estimates are exact
    exact.foreach { case (t, c) => assert(est(t) == c, s"tok=$t") }
    // tight sketch: still never below the true count
    val tight = Sketches.cmsCounters(df, "tok", width = 2, depth = 2)
    val estT = Sketches.cmsEstimate(tight, toks.distinct.toDF("tok"), "tok", 2, 2)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (t, c) => assert(estT(t) >= c, s"tok=$t") }
    // unseen candidate reads 0 through the wide sketch's empty cells... or
    // a collision's mass; with width 1024 and 4 tokens it must be 0
    val unseen = Sketches.cmsEstimate(counters, Seq("omega").toDF("tok"), "tok", 1024, 4)
      .as[(String, Long)].collect().toMap
    assert(unseen("omega") == 0L)
  }

  test("cmsCounters: cells match the hand-computed counter table") {
    val toks = Seq("a", "b", "a", "c", "a", "b")
    val counters = Sketches.cmsCounters(toks.toDF("tok"), "tok", width = 8, depth = 3)
      .as[(Int, Long, Long)].collect().map { case (r, b, c) => (r, b) -> c }.toMap
    val expected = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .toSeq.flatMap { case (t, c) =>
        (0 until 3).map(r => (r, cmsBkt(t, r, 8)) -> c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(counters == expected)
    // every row of the sketch carries the full stream mass
    val rowMass = counters.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    (0 until 3).foreach(r => assert(rowMass(r) == toks.size.toLong, s"row $r"))
  }

  test("cmsMergeCounters: sharded sketches sum to the whole-corpus sketch") {
    val all = (1 to 400).map(i => s"tok${i % 37}")
    val whole = Sketches.cmsCounters(all.toDF("tok"), "tok", 16, 4)
    val sh1 = Sketches.cmsCounters(all.take(150).toDF("tok"), "tok", 16, 4)
    val sh2 = Sketches.cmsCounters(all.drop(150).toDF("tok"), "tok", 16, 4)
    val merged = Sketches.cmsMergeCounters(sh1, sh2)
    val w = whole.as[(Int, Long, Long)].collect().toSet
    val m = merged.as[(Int, Long, Long)].collect().toSet
    assert(w == m)
    // and the merged sketch is invariant to input partitioning
    val rep = Sketches.cmsCounters(all.toDF("tok").repartition(7), "tok", 16, 4)
    assert(rep.as[(Int, Long, Long)].collect().toSet == w)
  }

  /** Independent HDR key (mirrors Sketches.hdrKey). */
  private def hdrK(v: Long): Long =
    if (v <= 15) v
    else {
      val m = 64 - java.lang.Long.numberOfLeadingZeros(v)
      (m - 4).toLong * 16 + ((v >> (m - 5)) & 15)
    }

  test("hdrKey: matches the independent computation, is monotone, exact below 16") {
    val vs = Seq(0L, 1L, 15L, 16L, 17L, 31L, 32L, 33L, 63L, 64L, 100L, 1000L,
      65535L, 65536L, 1000000L, Long.MaxValue / 2)
    val got = vs.toDF("v").select($"v", Sketches.hdrKey($"v").as("k"))
      .as[(Long, Long)].collect().toMap
    vs.foreach(v => assert(got(v) == hdrK(v), s"v=$v"))
    // monotone across the dense low range and octave boundaries
    val dense = (0L to 4096L).toDF("v").select(Sketches.hdrKey($"v"))
      .as[Long].collect()
    assert(dense.zip(dense.tail).forall { case (a, b) => a <= b })
  }

  test("hdrQuantiles: exact on small values, ≤1/32 relative error above") {
    val small = (1L to 100L).flatMap(v => Seq.fill(3)(v)) // values ≤ 31 partly
    val hist = Sketches.hdrHistogram(small.toDF("v"), "v")
    val est = Sketches.hdrQuantiles(hist, Seq(0.1, 0.5, 0.9))
      .as[(Double, Long)].collect().toMap
    // rank-quantile of 300 copies of 1..100: q=0.5 → rank 150 → value 50
    assert(est(0.1) == 10L) // ≤ 31: exact bucket
    // 50 and 90 live in approximate octaves: check the error bound
    assert(math.abs(est(0.5) - 50.0) / 50.0 <= 1.0 / 32.0, s"got ${est(0.5)}")
    assert(math.abs(est(0.9) - 90.0) / 90.0 <= 1.0 / 32.0, s"got ${est(0.9)}")
    val big = (1L to 10000L).toDF("v")
    val estB = Sketches.hdrQuantiles(Sketches.hdrHistogram(big, "v"), Seq(0.5, 0.99))
      .as[(Double, Long)].collect().toMap
    assert(math.abs(estB(0.5) - 5000.0) / 5000.0 <= 1.0 / 32.0, s"got ${estB(0.5)}")
    assert(math.abs(estB(0.99) - 9900.0) / 9900.0 <= 1.0 / 32.0, s"got ${estB(0.99)}")
  }

  test("hdrMerge: sharded histograms combine to the whole; negative/null excluded") {
    val all = (-50L to 5000L).toDF("v")
    val whole = Sketches.hdrHistogram(all, "v").as[(Long, Long)].collect().toSet
    val m = Sketches.hdrMerge(
      Sketches.hdrHistogram(all.filter($"v" % 3 === 0), "v"),
      Sketches.hdrHistogram(all.filter($"v" % 3 =!= 0), "v"))
      .as[(Long, Long)].collect().toSet
    assert(whole == m)
    // negatives dropped: total mass is only the non-negative count
    assert(whole.toSeq.map(_._2).sum == 5001L)
  }

  test("streaming sketch stores: any batch decomposition equals the one-shot sketch") {
    import graft.streaming.StreamOps
    val docs = (0L until 300L).map(i =>
      (i, s"tok${i % 17} tok${(i * i) % 17} tok${i % 5} filler${i % 41}"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("sketch_store").toString
    try {
      // CMS: three uneven batches vs the whole corpus
      Seq(docs.filter($"doc_id" < 50), docs.filter($"doc_id" >= 50 && $"doc_id" < 260),
        docs.filter($"doc_id" >= 260))
        .foreach(b => StreamOps.cmsUpdateBatch(b, "text", s"$tmp/cms", 64, 4))
      val streamed = spark.read.parquet(s"$tmp/cms")
        .as[(Int, Long, Long)].collect().toSet
      val toks = docs.select(explode(graft.ext.Dedup.tokens($"text")).as("tok"))
        .filter($"tok" =!= "")
      val oneShot = Sketches.cmsCounters(toks, "tok", 64, 4)
        .as[(Int, Long, Long)].collect().toSet
      assert(streamed == oneShot)
      // HDR: same decomposition law for the length histogram
      Seq(docs.filter($"doc_id" % 2 === 0), docs.filter($"doc_id" % 2 === 1))
        .foreach(b => StreamOps.hdrUpdateBatch(b, length($"text").cast("long"), s"$tmp/hdr"))
      val hs = spark.read.parquet(s"$tmp/hdr").as[(Long, Long)].collect().toSet
      val ho = Sketches.hdrHistogram(docs.select(length($"text").cast("long").as("v")), "v")
        .as[(Long, Long)].collect().toSet
      assert(hs == ho)
      // bottom-k sample: same decomposition law, ORDERED equality (the
      // store IS the k smallest (h, id) pairs)
      Seq(docs.filter($"doc_id" < 80), docs.filter($"doc_id" >= 80 && $"doc_id" < 90),
        docs.filter($"doc_id" >= 90))
        .foreach(b => StreamOps.bottomKUpdateBatch(b, $"doc_id" * 7919L, s"$tmp/bk", 16))
      val bs = spark.read.parquet(s"$tmp/bk").orderBy("h", "id")
        .as[(Long, Long)].collect().toSeq
      val bo = Sketches.bottomKSample(
        docs.select(($"doc_id" * 7919L).as("key")), "key", 16)
        .orderBy("h", "id").as[(Long, Long)].collect().toSeq
      assert(bs == bo && bs.length == 16)
      // HLL registers: same decomposition law, and OVERLAPPING batches
      // too — register max is idempotent, so re-ingesting rows is a no-op
      Seq(docs.filter($"doc_id" < 120), docs.filter($"doc_id" >= 100))
        .foreach(b => StreamOps.hllUpdateBatch(b, $"doc_id" * 104729L, s"$tmp/hll", 8))
      val rs = spark.read.parquet(s"$tmp/hll").as[(Long, Int)].collect().toSet
      val ro = Sketches.hllRegisters(
        docs.select(($"doc_id" * 104729L).as("v")), "v", 8)
        .as[(Long, Int)].collect().toSet
      assert(rs == ro, "overlapping-batch HLL store must equal the one-shot registers")
      // term-count store: counts ADD, so any decomposition is the exact
      // one-shot count table
      Seq(docs.filter($"doc_id" < 40), docs.filter($"doc_id" >= 40 && $"doc_id" < 41),
        docs.filter($"doc_id" >= 41))
        .foreach(b => StreamOps.termCountUpdateBatch(b, "text", s"$tmp/tc"))
      val ts = spark.read.parquet(s"$tmp/tc").as[(String, Long)].collect().toSet
      val to = graft.ext.TextStats.termCounts(docs).as[(String, Long)].collect().toSet
      assert(ts == to, "streamed term counts must equal the one-shot counts exactly")
      // partitioned-upsert layout: same merge law, bit-exact vs BOTH the
      // one-shot counts and the default layout; only touched buckets are
      // rewritten (untouched partition dirs must survive later batches)
      Seq(docs.filter($"doc_id" < 40), docs.filter($"doc_id" >= 40 && $"doc_id" < 41),
        docs.filter($"doc_id" >= 41))
        .foreach(b => StreamOps.termCountUpsertBatch(b, "text", s"$tmp/tcp", numBuckets = 8))
      val tp = StreamOps.readTermCountStore(spark, s"$tmp/tcp")
        .as[(String, Long)].collect().toSet
      assert(tp == to, "partitioned-upsert store must equal the one-shot counts exactly")
      // a one-term trickle batch touches exactly one bucket and leaves
      // every other term's count untouched
      StreamOps.termCountUpsertBatch(
        Seq((9999L, "tok0")).toDF("doc_id", "text"), "text", s"$tmp/tcp", numBuckets = 8)
      val tp2 = StreamOps.readTermCountStore(spark, s"$tmp/tcp")
        .as[(String, Long)].collect().toMap
      val toM = to.toMap
      assert(tp2("tok0") == toM("tok0") + 1L)
      assert((tp2 - "tok0") == (toM - "tok0"),
        "trickle upsert must not disturb any other term")
      // an empty batch is a no-op (no partitions rewritten)
      StreamOps.termCountUpsertBatch(
        Seq((10000L, "   ")).toDF("doc_id", "text"), "text", s"$tmp/tcp", numBuckets = 8)
      assert(StreamOps.readTermCountStore(spark, s"$tmp/tcp")
        .as[(String, Long)].collect().toMap == tp2)
      // and the drift read-out over two stores equals the corpus form
      StreamOps.termCountUpdateBatch(docs.filter($"doc_id" % 2 === 0), "text", s"$tmp/tcA")
      StreamOps.termCountUpdateBatch(docs.filter($"doc_id" % 2 === 1), "text", s"$tmp/tcB")
      val viaStores = graft.ext.TextStats.jsDivergenceFromCounts(
          spark.read.parquet(s"$tmp/tcA"), spark.read.parquet(s"$tmp/tcB"))
        .as[(String, Long, Long, Double)].collect().toSet
      val direct = graft.ext.TextStats.jsDivergenceByTerm(
          docs.filter($"doc_id" % 2 === 0), docs.filter($"doc_id" % 2 === 1))
        .as[(String, Long, Long, Double)].collect().toSet
      assert(viaStores == direct, "drift over stores must equal drift over corpora")
    } finally {
      graft.core.Fs.rmTree(tmp)
    }
  }

  test("termCountUpsertBatch: marker stamps on create only; a mismatched upsert never re-stamps") {
    import graft.streaming.StreamOps
    val tmp = java.nio.file.Files.createTempDirectory("tc_marker").toString
    try {
      val store = s"$tmp/tcp"
      def batch(id: Long) = Seq((id, s"tok$id")).toDF("doc_id", "text")
      StreamOps.termCountUpsertBatch(batch(1L), "text", store, numBuckets = 8)
      // wrong layout value fails fast against the creation-time marker
      intercept[IllegalArgumentException](
        StreamOps.termCountUpsertBatch(batch(2L), "text", store, numBuckets = 4))
      // the failed call must NOT have re-stamped: the creation value
      // still passes, and the wrong value still fails (round-11 advice:
      // the every-upsert rewrite let one bad call invert the guard)
      StreamOps.termCountUpsertBatch(batch(3L), "text", store, numBuckets = 8)
      intercept[IllegalArgumentException](
        StreamOps.termCountUpsertBatch(batch(4L), "text", store, numBuckets = 4))
      assert(StreamOps.readTermCountStore(spark, store)
        .as[(String, Long)].collect().toMap == Map("tok1" -> 1L, "tok3" -> 1L))
    } finally {
      graft.core.Fs.rmTree(tmp)
    }
  }

  test("bottomKSample: merge law; two-sketch resemblance equals the direct form") {
    // 3-way uneven split, merged samples == one-shot sample, ordered
    val df = (1L to 5000L).map(i => i * 13 % 4999).toDF("id")
    val whole = Sketches.bottomKSample(df, "id", 64)
      .orderBy("h", "id").as[(Long, Long)].collect().toSeq
    val merged = Seq(df.filter($"id" < 300),
        df.filter($"id" >= 300 && $"id" < 2100), df.filter($"id" >= 2100))
      .map(Sketches.bottomKSample(_, "id", 64))
      .reduce(Sketches.mergeBottomK(_, _, 64))
      .orderBy("h", "id").as[(Long, Long)].collect().toSeq
    assert(merged == whole && whole.length == 64)
    // two persisted samples estimate EXACTLY what co-scanning estimates
    val a = (1L to 3000L).toDF("id"); val b = (1500L to 4500L).toDF("id")
    val direct = Sketches.corpusResemblance(a, b, "id", 128).collect().toSeq
    val viaSamples = Sketches.resemblanceFromSamples(
      Sketches.bottomKSample(a, "id", 128),
      Sketches.bottomKSample(b, "id", 128), 128).collect().toSeq
    assert(viaSamples == direct, s"$viaSamples vs $direct")
  }

  test("mixHash: column arithmetic agrees with an independent 64-bit implementation") {
    val ids = Seq(0L, 1L, 17L, 65536L, 2147483647L)
    val rows = ids.toDF("id").select(col("id"), Sketches.mixHash(col("id")).as("h"))
      .as[(Long, Long)].collect().toMap
    ids.foreach { id => assert(rows(id) == kh(id), s"id=$id") }
    // stays in the 32-bit range (the overflow-free split-multiply contract)
    assert(rows.values.forall(h => h >= 0 && h < 4294967296L))
  }

  test("corpusResemblance: exact below k, estimated above, edge cases") {
    def row(d: org.apache.spark.sql.DataFrame) = {
      val r = d.head()
      (r.getAs[Long]("k"), r.getAs[Long]("n_kept"), r.getAs[Long]("n_a"),
       r.getAs[Long]("n_b"), r.getAs[Long]("n_both"),
       r.getAs[Double]("resemblance_est"), r.getAs[Double]("containment_a_est"),
       r.getAs[Double]("containment_b_est"))
    }
    // union ≤ k → EXACT Jaccard AND containments: A=1..60, B=31..90
    val a = (1L to 60L).toDF("id"); val b = (31L to 90L).toDF("id")
    val ex = row(Sketches.corpusResemblance(a, b, "id", 128))
    assert(ex == ((128L, 90L, 60L, 60L, 30L, 30.0 / 90.0, 0.5, 0.5)), s"$ex")
    // identical and disjoint corpora
    assert(row(Sketches.corpusResemblance(a, a, "id", 128))._6 == 1.0)
    assert(row(Sketches.corpusResemblance(a, (200L to 260L).toDF("id"), "id", 128))._6 == 0.0)
    // asymmetric containment: A=1..30 fully inside B=1..90 → C_A=1, C_B=1/3
    val sub = row(Sketches.corpusResemblance((1L to 30L).toDF("id"), (1L to 90L).toDF("id"), "id", 128))
    assert(sub._7 == 1.0 && math.abs(sub._8 - 1.0 / 3.0) < 1e-15, s"$sub")
    // estimate: |union|=15000, J=1/3, C=1/2, k=256 → within ±3·se (~0.09)
    val bigA = (1L to 10000L).toDF("id")
    val bigB = (5001L to 15000L).toDF("id")
    val est = row(Sketches.corpusResemblance(bigA, bigB, "id", 256))
    assert(est._2 == 256L)
    assert(math.abs(est._6 - 1.0 / 3.0) < 0.09, s"est ${est._6}")
    assert(math.abs(est._7 - 0.5) < 0.12 && math.abs(est._8 - 0.5) < 0.12, s"$est")
    // duplicates inside a side don't change set semantics
    val dupA = a.unionAll(a)
    assert(row(Sketches.corpusResemblance(dupA, b, "id", 128)) == ex)
    // partitioning invariance (deterministic bottom-k sample)
    assert(row(Sketches.corpusResemblance(bigA.repartition(13), bigB.repartition(7), "id", 256)) == est)
    // empty inputs
    val none = spark.emptyDataset[Long].toDF("id")
    assert(row(Sketches.corpusResemblance(none, none, "id", 8)) ==
      ((8L, 0L, 0L, 0L, 0L, 0.0, 0.0, 0.0)))
    // null keys are dropped, never sampled (Spark sorts NULLS FIRST,
    // standard SQL NULLS LAST — a null id would be an engine-divergent slot)
    val withNull = Seq(Some(1L), Some(2L), None).toDF("id")
    val nn = row(Sketches.corpusResemblance(withNull, (1L to 2L).toDF("id"), "id", 8))
    assert(nn._2 == 2L && nn._6 == 1.0, s"$nn")
    assert(Sketches.bottomKSample(withNull, "id", 8).count() == 2L)
  }
}
