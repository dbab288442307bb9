package graft

import graft.ext.SnapshotDiff

/** Delta classification coverage: all four statuses, content-vs-carry
  * column separation, null-content framing, and the keyed rollup. */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def prev = Seq(
    (1L, Option("a"), "en"),     // unchanged
    (2L, Option("b"), "en"),     // changed text
    (3L, Option("c"), "de"),     // removed
    (4L, Option("d"), "en"),     // lang flips but text is the content -> unchanged
    (6L, Option.empty[String], "en") // null -> "null" string is a CHANGE
  ).toDF("doc_id", "text", "lang")

  private def cur = Seq(
    (1L, Option("a"), "en"),
    (2L, Option("B"), "en"),
    (4L, Option("d"), "fr"),
    (5L, Option("e"), "de"),     // added
    (6L, Option("null"), "en")
  ).toDF("doc_id", "text", "lang")

  test("diff: four statuses; content cols decide, carry cols ride along") {
    val out = SnapshotDiff.diff(prev, cur, "doc_id", Seq("text"), Seq("lang"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("status"), r.getAs[String]("lang")))).toMap
    assert(out(1L) == (("unchanged", "en")))
    assert(out(2L) == (("changed", "en")))
    assert(out(3L) == (("removed", "de")))   // carry falls back to prev
    assert(out(4L) == (("unchanged", "fr"))) // lang not in contentCols; carried from cur
    assert(out(5L) == (("added", "de")))
    assert(out(6L) == (("changed", "en")))   // null != the string "null"
  }

  test("diff: multi-column content and separator framing") {
    // lang in contentCols now makes doc 4 a change
    val out = SnapshotDiff.diff(prev, cur, "doc_id", Seq("text", "lang"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(out(4L) == "changed")
    // ("ab","c") vs ("a","bc") must NOT collide
    val p = Seq((1L, "ab", "c")).toDF("doc_id", "x", "y")
    val c = Seq((1L, "a", "bc")).toDF("doc_id", "x", "y")
    val r = SnapshotDiff.diff(p, c, "doc_id", Seq("x", "y")).collect()(0)
    assert(r.getAs[String]("status") == "changed")
  }

  test("diffSummary: per-group status counts") {
    val out = SnapshotDiff.diffSummary(prev, cur, "doc_id", Seq("text"), Seq("lang"))
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[String]("status")) ->
        r.getAs[Long]("n_docs")).toMap
    assert(out == Map(
      ("de", "added") -> 1L, ("de", "removed") -> 1L,
      ("en", "changed") -> 2L, ("en", "unchanged") -> 1L,
      ("fr", "unchanged") -> 1L), s"got $out")
  }
}
