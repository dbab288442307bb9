package graft

import graft.ext.TextStats

/** Hand-computed coverage for [[TextStats.phraseBlocklistHits]] — the
  * multi-word half of the C4 badwords pass. */
class PhraseBlocklistSpec extends SparkSpec {

  import spark.implicits._

  private def hits(docs: org.apache.spark.sql.DataFrame, phrases: Seq[String]) =
    TextStats.phraseBlocklistHits(docs, "doc_id", "text", phrases)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("phrases match as consecutive normalized token subsequences") {
    val docs = Seq(
      (1L, "the Bad phrase! appears here"),
      (2L, "bad things and a phrase apart"), // non-consecutive: no hit
      (3L, "a bad-phrase hyphenated"), // one TOKEN — not a 2-token match
      (4L, "clean text entirely")
    ).toDF("doc_id", "text")
    assert(hits(docs, Seq(" Bad  phrase!! ")) == Seq((1L, 1L)))
  }

  test("every occurrence counts, overlaps included") {
    val docs = Seq(
      (1L, "bad phrase bad phrase"), // positions 0 and 2
      (2L, "a a a") // "a a" at positions 0 and 1 — overlapping
    ).toDF("doc_id", "text")
    assert(hits(docs, Seq("bad phrase")) == Seq((1L, 2L)))
    assert(hits(docs, Seq("a a")) == Seq((2L, 2L)))
  }

  test("mixed entry lengths share the one scan; hit-free docs are absent") {
    val docs = Seq(
      (1L, "run the slow query now"),
      (2L, "merge it and merge again"),
      (3L, "slow and steady query")
    ).toDF("doc_id", "text")
    assert(hits(docs, Seq("merge", "slow query")) == Seq((1L, 1L), (2L, 2L)))
  }

  test("null text emits nothing; punct-only tokens never assemble grams") {
    val docs = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, "bad !!! phrase") // "!!!" normalizes empty: not consecutive
    ).toDF("doc_id", "text")
    assert(hits(docs, Seq("bad phrase")) == Seq.empty)
  }

  test("validation raises on empty or all-punct lists") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      TextStats.phraseBlocklistHits(docs, "doc_id", "text", Seq.empty))
    intercept[IllegalArgumentException](
      TextStats.phraseBlocklistHits(docs, "doc_id", "text", Seq("!!!", "--")))
  }
}
