package graft

import org.apache.spark.sql.functions._
import graft.ext.Dsir

class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("gramBuckets: 2n-1 grams per doc, buckets in range") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "solo")).toDF("doc_id", "text")
    val g = Dsir.gramBuckets(df, "doc_id", "text", buckets = 16)
    val perDoc = g.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc == Map(1L -> 5L, 2L -> 1L), s"$perDoc")
    assert(g.filter(col("bucket") < 0 || col("bucket") >= 16).count() == 0)
  }

  test("identical target and raw corpora give zero log-ratios and zero scores") {
    val corpus = Seq((1L, "the cat sat"), (2L, "a dog ran far")).toDF("doc_id", "text")
    val ratios = Dsir.trainImportanceRatios(corpus, corpus, buckets = 64)
    assert(ratios.count() == 64, "every bucket materialized")
    assert(ratios.filter(abs(col("log_ratio")) > 1e-12).count() == 0)
    val scores = Dsir.dsirScores(corpus, ratios, buckets = 64)
    assert(scores.filter(abs(col("dsir_logw")) > 1e-9).count() == 0)
  }

  test("docs matching the target vocabulary outscore off-target docs") {
    val target = (0L until 20L).map(i => (i, "clean prose about science and method"))
      .toDF("doc_id", "text")
    val raw = ((100L until 110L).map(i => (i, "clean prose about science and method")) ++
      (200L until 210L).map(i => (i, "zz spam garble xx yy noise qq ww")))
      .toDF("doc_id", "text")
    val ratios = Dsir.trainImportanceRatios(target, raw, buckets = 256)
    val s = Dsir.dsirScores(raw, ratios, buckets = 256)
      .withColumn("on_target", col("doc_id") < 150)
    val mOn = s.filter(col("on_target")).agg(avg("dsir_logw")).head().getDouble(0)
    val mOff = s.filter(!col("on_target")).agg(avg("dsir_logw")).head().getDouble(0)
    assert(mOn > mOff + 1.0, s"on-target $mOn must clearly beat off-target $mOff")
    // resampling at k = 10 must then pick essentially only on-target docs
    val picked = Dsir.dsirResample(s, k = 10, epoch = 0)
    assert(picked.count() == 10)
    val offPicked = picked.filter(!col("on_target")).count()
    assert(offPicked == 0, s"$offPicked off-target docs selected despite a large weight gap")
  }

  test("resample: deterministic per epoch, different epochs differ, guards") {
    val scored = (0L until 100L).map(i => (i, 0.0)).toDF("doc_id", "dsir_logw")
    val a = Dsir.dsirResample(scored, k = 5, epoch = 1).select("doc_id").as[Long].collect()
    val b = Dsir.dsirResample(scored, k = 5, epoch = 1).select("doc_id").as[Long].collect()
    assert(a.toSeq == b.toSeq, "same epoch must reproduce the same subset")
    val c = Dsir.dsirResample(scored, k = 5, epoch = 2).select("doc_id").as[Long].collect()
    assert(a.toSeq != c.toSeq, "different epochs should draw different subsets")
    intercept[IllegalArgumentException] { Dsir.dsirResample(scored, k = 0) }
    intercept[IllegalArgumentException] {
      Dsir.trainImportanceRatios(scored.withColumnRenamed("dsir_logw", "text"),
        scored.withColumnRenamed("dsir_logw", "text"), smoothing = 0.0)
    }
  }
}
