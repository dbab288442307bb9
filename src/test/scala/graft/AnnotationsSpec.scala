package graft

import graft.ext.Annotations

/** Hand-computed coverage for [[graft.ext.Annotations]] (majority-vote
  * consensus + annotator quality): three items, three annotators, one
  * abstention, one exact tie — every consensus decision checkable by
  * eye. */
class AnnotationsSpec extends SparkSpec {
  import spark.implicits._

  // item 1: a, a, b -> consensus a (2/3); item 2: a, b, NULL -> tie,
  // label asc -> a (1/2); item 3: b, b, b -> b (3/3)
  private def votes = Seq(
    (1L, "x", Option("a")), (1L, "y", Option("a")), (1L, "z", Option("b")),
    (2L, "x", Option("a")), (2L, "y", Option("b")), (2L, "z", Option.empty[String]),
    (3L, "x", Option("b")), (3L, "y", Option("b")), (3L, "z", Option("b"))
  ).toDF("doc_id", "annotator", "label")

  test("majorityVote: counts, tie-by-label, abstention dropped, canonized fraction") {
    val mv = Annotations.majorityVote(votes).collect().map(r =>
      r.getAs[Long]("doc_id") -> (r.getAs[String]("label"),
        r.getAs[Long]("n_votes"), r.getAs[Long]("n_total"),
        r.getAs[Double]("vote_frac"))).toMap
    assert(mv(1L) == ("a", 2L, 3L, 0.666667), s"got $mv")
    assert(mv(2L) == ("a", 1L, 2L, 0.5), s"got $mv") // tie -> smaller label
    assert(mv(3L) == ("b", 3L, 3L, 1.0), s"got $mv")
  }

  test("annotatorQuality: agreement with consensus; abstentions score nothing") {
    val q = Annotations.annotatorQuality(votes, Annotations.majorityVote(votes))
      .collect().map(r => r.getAs[String]("annotator") ->
        (r.getAs[Long]("n_votes"), r.getAs[Double]("agreement"))).toMap
    assert(q("x") == (3L, 1.0), s"got $q")       // agrees everywhere
    assert(q("y") == (3L, 0.666667), s"got $q")  // misses the item-2 tie
    assert(q("z") == (2L, 0.5), s"got $q")       // null vote dropped from n
  }

  test("majority vote is deterministic under re-evaluation and input order") {
    val shuffled = votes.orderBy(org.apache.spark.sql.functions.rand(7))
    val a = Annotations.majorityVote(votes).orderBy("doc_id")
      .collect().map(_.toString).toSeq
    val b = Annotations.majorityVote(shuffled).orderBy("doc_id")
      .collect().map(_.toString).toSeq
    assert(a == b)
  }
}
