package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ext.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 2000L).map(i => (i, s"g${i % 4}", i * 3))
    .toDF("id", "grp", "chars")

  test("deterministic sample: reproducible, monotone in frac, exact at 0 and 1") {
    val a = Sampling.deterministicSample(docs, "id", 0.3).select("id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(docs, "id", 0.3).select("id").as[Long].collect().toSet
    assert(a == b, "same frac must select the same rows")
    val bigger = Sampling.deterministicSample(docs, "id", 0.6).select("id").as[Long].collect().toSet
    assert(a.subsetOf(bigger), "nested samples must be monotone")
    assert(Sampling.deterministicSample(docs, "id", 0.0).count() == 0)
    assert(Sampling.deterministicSample(docs, "id", 1.0).count() == 2000)
    // uniformity: 30% ± 5pp on 2000 ids
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05, s"got ${a.size} of 2000")
    intercept[IllegalArgumentException](Sampling.deterministicSample(docs, "id", 1.5))
  }

  test("stratified sample honors per-group fracs and the default") {
    val out = Sampling.stratifiedSample(docs, "id", "grp",
      fracs = Map("g0" -> 1.0, "g1" -> 0.0), defaultFrac = 0.5)
    val byGrp = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byGrp("g0") == 500, s"g0 frac=1 must keep all: $byGrp")
    assert(!byGrp.contains("g1"), s"g1 frac=0 must keep none: $byGrp")
    val d = (byGrp.getOrElse("g2", 0L) + byGrp.getOrElse("g3", 0L)) / 1000.0
    assert(math.abs(d - 0.5) < 0.07, s"default 0.5 off: $byGrp")
    // membership equals the global sampler's at the same frac
    val strat = Sampling.stratifiedSample(docs, "id", "grp", Map("g2" -> 0.4))
      .filter($"grp" === "g2").select("id").as[Long].collect().toSet
    val glob = Sampling.deterministicSample(docs.filter($"grp" === "g2"), "id", 0.4)
      .select("id").as[Long].collect().toSet
    assert(strat == glob)
  }

  test("stratified sample plans as a broadcast join, not a shuffle") {
    val out = Sampling.stratifiedSample(docs, "id", "grp", Map("g0" -> 0.5))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join:\n$plan")
  }

  test("takePerGroup keeps exactly k per group, whole groups when small, none at 0") {
    val out = Sampling.takePerGroup(docs, "id", "grp", 100)
    val byGrp = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byGrp.values.forall(_ == 100), s"$byGrp")
    // deterministic: same selection twice
    val a = out.select("id").as[Long].collect().toSet
    val b = Sampling.takePerGroup(docs, "id", "grp", 100).select("id").as[Long].collect().toSet
    assert(a == b)
    // small group keeps everything
    val tiny = docs.filter($"id" < 3)
    assert(Sampling.takePerGroup(tiny, "id", "grp", 100).count() == 3)
    assert(Sampling.takePerGroup(docs, "id", "grp", 0).count() == 0)
    intercept[IllegalArgumentException](Sampling.takePerGroup(docs, "id", "grp", -1))
  }

  test("epochShuffle: a permutation, stable per epoch, distinct across epochs") {
    import graft.ext.Sampling
    val ids = docs.select("id")
    val e0 = Sampling.epochShuffle(ids, "id", 0).select("id").as[Long].collect()
    val e0again = Sampling.epochShuffle(ids, "id", 0).select("id").as[Long].collect()
    val e1 = Sampling.epochShuffle(ids, "id", 1).select("id").as[Long].collect()
    // permutation of the full id set, bit-stable on re-run
    assert(e0.sorted.toSeq == (0L until 2000L))
    assert(e0.toSeq == e0again.toSeq)
    // different epochs give (very) different orders
    assert(e0.toSeq != e1.toSeq)
    assert(e1.sorted.toSeq == (0L until 2000L))
    // not the identity: sequential ids must scatter
    assert(e0.take(20).toSeq != (0L until 20L))
    // partitioning-invariant: the global sort fixes one total order
    val rep = Sampling.epochShuffle(ids.repartition(13), "id", 0)
      .select("id").as[Long].collect()
    assert(rep.toSeq == e0.toSeq)
  }

  test("weightedKeep: probability-proportional, deterministic, loud on bad weights") {
    import graft.ext.Sampling
    val n = 20000
    val df = (0L until n.toLong).map(i => (i, (i % 10).toDouble / 10.0)).toDF("id", "w")
    val kept = Sampling.weightedKeep(df, "id", "w")
    // w=0 never kept; kept fraction per weight bucket tracks the weight
    val byW = kept.groupBy("w").count().as[(Double, Long)].collect().toMap
    assert(!byW.contains(0.0))
    (1 to 9).foreach { k =>
      val frac = byW.getOrElse(k / 10.0, 0L).toDouble / (n / 10)
      assert(math.abs(frac - k / 10.0) < 0.05, s"w=${k / 10.0} frac=$frac")
    }
    // deterministic: same rows on re-run; w=1 keeps everything
    assert(kept.select("id").as[Long].collect().toSeq ==
      Sampling.weightedKeep(df, "id", "w").select("id").as[Long].collect().toSeq)
    val allW1 = (0L until 100L).map((_, 1.0)).toDF("id", "w")
    assert(Sampling.weightedKeep(allW1, "id", "w").count() == 100L)
    // out-of-range weight fails loudly, not silently clamps
    val bad = Seq((1L, 1.5)).toDF("id", "w")
    val e = intercept[Exception] { Sampling.weightedKeep(bad, "id", "w").collect() }
    assert(e.getMessage != null)
    // NULL weight also fails, with a READABLE message (concat would
    // null-propagate into raise_error(NULL) without the coalesce)
    val nullW = Seq((1L, Option.empty[Double]), (2L, Some(0.5))).toDF("id", "w")
    val e2 = intercept[Exception] { Sampling.weightedKeep(nullW, "id", "w").collect() }
    def msgs(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} ${msgs(t.getCause)}"
    assert(msgs(e2).contains("NULL"), s"unreadable null-weight error: ${msgs(e2)}")
  }

  test("samplers reject a non-numeric id column up front") {
    val bad = docs.withColumn("id", concat(lit("u"), $"id"))
    intercept[IllegalArgumentException](Sampling.deterministicSample(bad, "id", 0.5))
    intercept[IllegalArgumentException](Sampling.stratifiedSample(bad, "id", "grp", Map("g0" -> 0.5)))
    intercept[IllegalArgumentException](Sampling.takePerGroup(bad, "id", "grp", 5))
    intercept[IllegalArgumentException](Sampling.deterministicSample(docs, "nope", 0.5))
  }

  test("deterministic sample + normalization compose on a stream (batch ≡ stream)") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("sample_stream").toString
    val src = graft.core.Tables.documents(spark, SparkSpec.sf0001)
      .select("doc_id", "text")
    src.write.mode("overwrite").parquet(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def xform(df: org.apache.spark.sql.DataFrame) =
      Sampling.deterministicSample(df, "doc_id", 0.5)
        .select($"doc_id", graft.ext.TextStats.normalizeForDedup($"text").as("norm"))
    val q = xform(spark.readStream.schema(schema).parquet(dir))
      .writeStream.format("memory").queryName("sample_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sample_out").orderBy("doc_id").collect()
      val batch = xform(spark.read.parquet(dir)).orderBy("doc_id").collect()
      assert(streamed.length == batch.length && streamed.length > 0)
      assert(streamed.sameElements(batch))
    } finally q.stop()
  }

  test("splitByCluster: near-dup clusters never straddle splits; weights validated") {
    import graft.ext.Sampling
    // 3000 docs; ids 0..299 form 100 planted 3-doc clusters via edges
    val docs = (0L until 3000L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val pairs = (0L until 100L).flatMap(c =>
      Seq((c * 3, c * 3 + 1), (c * 3 + 1, c * 3 + 2))).toDF("doc_a", "doc_b")
    val split = Sampling.splitByCluster(docs, pairs,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val byDoc = split.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // every planted cluster is split-homogeneous
    (0L until 100L).foreach { c =>
      val s = Set(byDoc(c * 3), byDoc(c * 3 + 1), byDoc(c * 3 + 2))
      assert(s.size == 1, s"cluster $c straddles splits: $s")
    }
    // rough distribution sanity on the unclustered majority
    val free = byDoc.filter(_._1 >= 300)
    val trainFrac = free.values.count(_ == "train").toDouble / free.size
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train frac $trainFrac")
    assert(free.values.toSet == Set("train", "val", "test"))
    // determinism across repartitioning
    val again = Sampling.splitByCluster(docs.repartition(13), pairs,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == byDoc)
    // invalid weights fail loud
    intercept[IllegalArgumentException] {
      Sampling.splitByCluster(docs, pairs, Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Sampling.splitByCluster(docs, pairs, Seq("a" -> 0.5, "a" -> 0.5))
    }
  }

  test("weightedMix tags sources, samples at each weight, rejects dup tags") {
    val a = docs.filter($"grp" === "g0")
    val b = docs.filter($"grp" =!= "g0")
    val mix = Sampling.weightedMix(Seq(("small", a, 0.2), ("big", b, 1.0)), "id")
    val byTag = mix.groupBy("mix_source").count().as[(String, Long)].collect().toMap
    assert(byTag("big") == 1500)
    assert(byTag("small") == Sampling.deterministicSample(a, "id", 0.2).count())
    assert(mix.columns.contains("mix_source"))
    intercept[IllegalArgumentException](
      Sampling.weightedMix(Seq(("x", a, 0.5), ("x", b, 0.5)), "id"))
  }

  private lazy val weighted = docs.withColumn("w",
    when($"id" % 2 === 0, 8.0).otherwise(1.0))

  test("weightedSample: inclusion scales with weight across epochs") {
    // one job over 40 epochs: rank per epoch, keep top-20 of 2000, then
    // compare inclusion mass of the w=8 ids vs the w=1 ids
    val perEpoch = (0 until 40).map { e =>
      Sampling.weightedSample(weighted, "id", "w", k = 20, epoch = e)
        .select($"id", $"w")
    }.reduce(_ unionAll _)
    val byW = perEpoch.groupBy("w").count().as[(Double, Long)].collect().toMap
    val heavy = byW.getOrElse(8.0, 0L).toDouble
    val light = byW.getOrElse(1.0, 0L).toDouble
    assert(heavy + light == 40 * 20)
    // k/n = 1%: inclusion ≈ proportional; demand a wide margin, not exact 8×
    assert(light > 0 && heavy / light > 3.0,
      s"w=8 ids must dominate the sample: heavy=$heavy light=$light")
  }

  test("weightedSample: deterministic, returns all rows when k >= n, TakeOrdered plan") {
    val a = Sampling.weightedSample(weighted, "id", "w", 30, epoch = 2)
    val b = Sampling.weightedSample(weighted, "id", "w", 30, epoch = 2)
    assert(a.select("id").as[Long].collect().toSet ==
      b.select("id").as[Long].collect().toSet)
    assert(Sampling.weightedSample(weighted, "id", "w", 5000).count() == 2000)
    a.collect()
    val plan = a.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected partial top-k, not a global sort:\n$plan")
  }

  test("esKey raises on zero, negative, null, and NaN weights") {
    def run(w: Column): Unit =
      weighted.withColumn("w2", w)
        .withColumn("k", Sampling.esKey($"id", $"w2")).collect()
    for (bad <- Seq(lit(0.0), lit(-1.0), lit(null).cast("double"),
        lit(Double.NaN))) {
      val e = intercept[Exception](run(bad))
      assert(e.getMessage.contains("es key weight"),
        s"wrong failure for $bad: ${e.getMessage}")
    }
  }

  test("ES streaming store: any batch decomposition ≡ one-shot sample, bit-identical") {
    val tmp = java.nio.file.Files.createTempDirectory("es_store")
    val store = s"$tmp/store"
    try {
      Seq(weighted.filter($"id" < 300),
        weighted.filter($"id" >= 300 && $"id" < 1100),
        weighted.filter($"id" >= 1100))
        .foreach(b => graft.streaming.StreamOps.esUpdateBatch(
          b, "id", "w", store, k = 25, epoch = 3))
      val streamed = spark.read.parquet(store)
        .select("id", "weight", "es_key").as[(Long, Double, Double)]
        .collect().toSet
      val oneShot = Sampling.weightedSample(weighted, "id", "w", 25, epoch = 3)
        .select($"id", $"w".as("weight"), $"es_key")
        .as[(Long, Double, Double)].collect().toSet
      assert(streamed == oneShot, "merge law must make stream ≡ batch exactly")
      assert(streamed.size == 25)
    } finally graft.core.Fs.rmTree(tmp)
  }

  test("globalOrdinal equals the single-window global row_number, ties broken by id") {
    val df = Seq((1L, 5.0), (2L, 1.0), (3L, 5.0), (4L, 0.5), (5L, 3.0),
      (6L, 1.0), (7L, 9.0)).toDF("id", "score")
    // expected rank by (score asc, id asc)
    val expected = Map(4L -> 1L, 2L -> 2L, 6L -> 3L, 5L -> 4L,
      1L -> 5L, 3L -> 6L, 7L -> 7L)
    for (nb <- Seq(1, 4, 1000)) {
      val got = Sampling.globalOrdinal(df, "score", "id", nBuckets = nb)
        .select($"id", $"ordinal").as[(Long, Long)].collect().toMap
      assert(got == expected, s"nBuckets=$nb: got $got")
    }
  }

  test("globalOrdinal: constant scores fall into one bucket, id breaks all ties") {
    val df = (1L to 10L).map(i => (i, 7.0)).toDF("id", "score")
    val got = Sampling.globalOrdinal(df, "score", "id")
      .select($"id", $"ordinal").as[(Long, Long)].collect().toMap
    assert(got == (1L to 10L).map(i => i -> i).toMap, s"got $got")
  }

  test("exactQuantiles: type-1 empirical quantiles, hand-checked") {
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "v")
    val got = Sampling.exactQuantiles(df, "v", Seq(0.01, 0.25, 0.5, 0.99, 1.0), "id")
      .as[(Double, Double)].collect().toMap
    // rank = ceil(q*100): 1, 25, 50, 99, 100
    assert(got == Map(0.01 -> 1.0, 0.25 -> 25.0, 0.5 -> 50.0,
      0.99 -> 99.0, 1.0 -> 100.0), s"got $got")
    intercept[IllegalArgumentException](
      Sampling.exactQuantiles(df, "v", Seq(0.0), "id"))
    intercept[IllegalArgumentException](
      Sampling.exactQuantiles(df, "v", Nil, "id"))
  }

  test("globalOrdinal drops null scores and validates nBuckets") {
    val df = Seq((1L, Some(2.0)), (2L, None), (3L, Some(1.0)))
      .toDF("id", "score")
    val got = Sampling.globalOrdinal(df, "score", "id")
      .select($"id", $"ordinal").as[(Long, Long)].collect().toMap
    assert(got == Map(3L -> 1L, 1L -> 2L), s"got $got")
    intercept[IllegalArgumentException](
      Sampling.globalOrdinal(df, "score", "id", nBuckets = 0))
  }
}
