package graft

import java.sql.Timestamp
import graft.ext.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // left: key A at t=10, 20; key B at t=15. right: A at 5 (v=1), 10 (v=2),
  // 18 (v=3); B at 30 (v=9).
  private def left = Seq(("A", ts(10), "l1"), ("A", ts(20), "l2"), ("B", ts(15), "l3"))
    .toDF("k", "t", "tag")
  private def right = Seq(("A", ts(5), 1.0), ("A", ts(10), 2.0), ("A", ts(18), 3.0),
    ("B", ts(30), 9.0)).toDF("k", "t", "v")

  test("backward: nearest prior wins, exact ts matches, no-prior is null") {
    val out = AsOf.asofJoin(left, right, Seq("k"), "t", Seq("v"))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Double]("asof_v")).map(_.doubleValue)).toMap
    assert(out("l1") == Some(2.0), s"exact-ts match should win: $out") // t=10 right row
    assert(out("l2") == Some(3.0), s"nearest prior: $out")             // t=18 < 20
    assert(out("l3") == None, s"B has no prior right row: $out")       // B right at 30 > 15
  }

  test("forward: nearest later wins; exact still matches") {
    val out = AsOf.asofJoin(left, right, Seq("k"), "t", Seq("v"), direction = "forward")
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Double]("asof_v")).map(_.doubleValue)).toMap
    assert(out("l1") == Some(2.0)) // exact t=10
    assert(out("l2") == None)      // no A right row after t=20
    assert(out("l3") == Some(9.0)) // B at 30 is the nearest later
  }

  test("tolerance nulls out matches farther than the interval") {
    val out = AsOf.asofJoin(left, right, Seq("k"), "t", Seq("v"),
        tolerance = Some("1 second"))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Double]("asof_v")).map(_.doubleValue)).toMap
    assert(out("l1") == Some(2.0)) // gap 0 <= 1s
    assert(out("l2") == None)      // gap 2s > 1s -> nulled
    // matched ts must be nulled together with the payload
    val tsOut = AsOf.asofJoin(left, right, Seq("k"), "t", Seq("v"),
        tolerance = Some("1 second"))
      .filter($"tag" === "l2").head().getAs[Timestamp]("asof_ts")
    assert(tsOut == null)
  }

  test("range join: overlap multiplicity, inclusive bounds, per-key isolation") {
    val pts = Seq(("A", ts(100), "p1"), ("A", ts(250), "p2"), ("B", ts(100), "p3"))
      .toDF("k", "t", "tag")
    val ivals = Seq(
      ("A", ts(50), ts(150), "w1"),   // contains p1
      ("A", ts(100), ts(300), "w2"),  // contains p1 (start==t) and p2
      ("A", ts(250), ts(260), "w3"),  // contains p2 (start==t)
      ("B", ts(90), ts(100), "w4"),   // contains p3 (end==t)
      ("A", ts(400), ts(300), "bad")  // end < start: dropped, matches nothing
    ).toDF("k", "ws", "we", "win")
    val out = AsOf.rangeJoin(pts, ivals, Seq("k"), "t", "ws", "we", Seq("win"),
        bucketWidthSeconds = 60)
      .collect().map(r => (r.getAs[String]("tag"), r.getAs[String]("win"))).toSet
    assert(out == Set(("p1", "w1"), ("p1", "w2"), ("p2", "w2"), ("p2", "w3"),
      ("p3", "w4")), s"got $out")
  }

  test("range join: interval spanning many buckets matches once, no duplicates") {
    val pts = Seq(("A", ts(5000), "p")).toDF("k", "t", "tag")
    val ivals = Seq(("A", ts(0), ts(100000), "wide")).toDF("k", "ws", "we", "win")
    val rows = AsOf.rangeJoin(pts, ivals, Seq("k"), "t", "ws", "we", Seq("win"),
      bucketWidthSeconds = 10) // interval explodes to ~10k buckets
    assert(rows.count() == 1L)
  }

  test("range join: interval exceeding the bucket cap is dropped, not exploded") {
    // a far-future sentinel end (9999-12-31) would explode sequence() into
    // billions of bucket rows; the cap drops the row under the same policy
    // as end < start
    val pts = Seq(("A", ts(100), "p1")).toDF("k", "t", "tag")
    val sentinel = Timestamp.valueOf("9999-12-31 00:00:00")
    val ivals = Seq(
      ("A", ts(50), ts(150), "ok"),
      ("A", ts(60), sentinel, "runaway")).toDF("k", "ws", "we", "win")
    val out = AsOf.rangeJoin(pts, ivals, Seq("k"), "t", "ws", "we", Seq("win"),
        bucketWidthSeconds = 60, maxBucketsPerInterval = 1000L)
      .collect().map(r => (r.getAs[String]("tag"), r.getAs[String]("win"))).toSet
    assert(out == Set(("p1", "ok")), s"got $out")
    // boundary: the ok interval spans buckets 0..2 = 3 bucket rows;
    // cap=3 admits it exactly, cap=2 drops it
    def capped(cap: Long) = AsOf.rangeJoin(pts, ivals.filter($"win" === "ok"),
      Seq("k"), "t", "ws", "we", Seq("win"),
      bucketWidthSeconds = 60, maxBucketsPerInterval = cap)
    assert(capped(3L).count() == 1L)
    assert(capped(2L).count() == 0L)
  }

  test("left columns pass through unchanged; keys partition the match") {
    val out = AsOf.asofJoin(left, right, Seq("k"), "t", Seq("v"))
    assert(out.columns.toSeq == Seq("k", "t", "tag", "asof_ts", "asof_v"))
    assert(out.count() == 3) // exactly one output row per left row
  }
}
