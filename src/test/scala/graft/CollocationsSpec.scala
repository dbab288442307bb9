package graft

import graft.ext.TextStats

/** Hand-computed coverage for [[TextStats.collocations]] (word2phrase,
  * Mikolov 2013 §4). Corpus: "new york new york city" + "in new york" →
  * N = 8 tokens; bigrams (new,york)=3, (york,new)=1, (york,city)=1,
  * (in,new)=1; exact unigrams new=3, york=3, city=1, in=1.
  */
class CollocationsSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Seq(
    (1L, "new york new york city"),
    (2L, "in new york")
  ).toDF("doc_id", "text")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq

  test("discounted scaled PMI matches the hand computation") {
    val out = rows(TextStats.collocations(corpus, minCount = 2, delta = 1.0, topN = 10))
    // only (new, york) survives minCount=2:
    // score = (3 − 1) · 8 / (3 · 3) = 16/9 = 1.777778 after 1e-6 canon
    assert(out == Seq(("new", "york", 3L, 3L, 3L, 1.777778)))
  }

  test("rank is (score desc, w1, w2) with canonized ties") {
    val out = rows(TextStats.collocations(corpus, minCount = 1, delta = 1.0, topN = 10))
    // the three once-seen bigrams all score (1−1)·8/… = 0 and tie
    assert(out.map(t => (t._1, t._2)) ==
      Seq(("new", "york"), ("in", "new"), ("york", "city"), ("york", "new")))
    assert(out.head._6 == 1.777778 && out.tail.forall(_._6 == 0.0))
  }

  test("topN cuts after the deterministic rank") {
    val out = rows(TextStats.collocations(corpus, minCount = 1, delta = 1.0, topN = 2))
    assert(out.map(t => (t._1, t._2)) == Seq(("new", "york"), ("in", "new")))
  }

  test("null text contributes nothing; empty text contributes one token and no bigram") {
    val withJunk = corpus.union(Seq(
      (3L, null.asInstanceOf[String]), (4L, "")).toDF("doc_id", "text"))
    val out = rows(TextStats.collocations(withJunk, minCount = 2, delta = 1.0, topN = 10))
    // N grows 8 → 9 (the one "" token): score = 2 · 9 / 9 = 2.0
    assert(out == Seq(("new", "york", 3L, 3L, 3L, 2.0)))
  }

  test("validation raises on bad arguments") {
    intercept[IllegalArgumentException](TextStats.collocations(corpus, minCount = 0))
    intercept[IllegalArgumentException](TextStats.collocations(corpus, delta = -1.0))
    intercept[IllegalArgumentException](TextStats.collocations(corpus, topN = 0))
  }
}
