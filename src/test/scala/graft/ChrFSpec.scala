package graft

import graft.ext.ChrF

/** Hand-computed coverage for [[graft.ext.ChrF]]: per-order clipping,
  * order exclusion, whitespace/case folding, the beta weighting, and
  * the Rouge-convention null semantics. Expected values cross-checked
  * against an independent Python mirror of the definition. */
class ChrFSpec extends SparkSpec {
  import spark.implicits._

  private def pairs = Seq(
    (1L, "ab cd", "abcd"),     // whitespace removed: identical -> 1.0
    (2L, "abcde", "abcdf"),    // per-order decay: mean over n=1..5
    (3L, "   ", "ab"),         // empty candidate: P, F null, R = 0
    (4L, "aaaa", "bbbb"),      // disjoint: all zero, F = 0 not null
    (5L, "aaa", "a"),          // clipping: hit_1 = min(3,1) = 1
    (6L, "The  Quick brown", "the quick  Brown") // case + runs fold
  ).toDF("pair_id", "candidate", "reference")

  test("chrF: hand-computed per-order stats, exclusion, clipping, canon") {
    val out = ChrF.chrF(pairs).collect().map(r =>
      r.getAs[Long]("pair_id") -> ((r.getAs[Long]("c_chars"), r.getAs[Long]("r_chars"),
        Option(r.getAs[java.lang.Double]("chrf_p")).map(_.doubleValue),
        Option(r.getAs[java.lang.Double]("chrf_r")).map(_.doubleValue),
        Option(r.getAs[java.lang.Double]("chrf")).map(_.doubleValue)))).toMap
    assert(out(1L) == ((4L, 4L, Some(1.0), Some(1.0), Some(1.0))), s"got ${out(1L)}")
    // n=1: 4/5, n=2: 3/4, n=3: 2/3, n=4: 1/2, n=5: 0/1, n=6 excluded:
    // mean = (.8 + .75 + .666667 + .5 + 0)/5 = 0.543333 on both sides
    assert(out(2L) == ((5L, 5L, Some(0.543333), Some(0.543333), Some(0.543333))),
      s"got ${out(2L)}")
    assert(out(3L) == ((0L, 2L, None, Some(0.0), None)), s"got ${out(3L)}")
    assert(out(4L) == ((4L, 4L, Some(0.0), Some(0.0), Some(0.0))), s"got ${out(4L)}")
    // P = (1/3 + 0 + 0)/3 = 0.111111 (orders 2,3 have cand grams, no ref
    // grams -> precision 0 counted, recall order excluded); R = 1
    assert(out(5L) == ((3L, 1L, Some(0.111111), Some(1.0), Some(0.384615))),
      s"got ${out(5L)}")
    assert(out(6L) == ((13L, 13L, Some(1.0), Some(1.0), Some(1.0))), s"got ${out(6L)}")
  }

  test("chrF: beta reweights recall (chrF1 vs chrF2); null sides dropped") {
    val p = Seq((5L, "aaa", "a")).toDF("pair_id", "candidate", "reference")
    // beta=1: harmonic mean 2PR/(P+R) = 0.2; beta=2 favors recall: 0.384615
    val f1 = ChrF.chrF(p, beta = 1.0).collect()(0).getAs[Double]("chrf")
    assert(f1 == 0.2, s"got $f1")
    val withNulls = Seq((1L, Option("ab"), Option("ab")),
      (2L, Option.empty[String], Option("x")),
      (3L, Option("x"), Option.empty[String]))
      .toDF("pair_id", "candidate", "reference")
    val out = ChrF.chrF(withNulls).collect()
    assert(out.map(_.getAs[Long]("pair_id")).toSet == Set(1L))
  }

  test("chrF: kernel helpers — codepoint strip and per-order stats") {
    assert(ChrF.stripChars(" A b\tC\nd ").toSeq ==
      "abcd".codePoints().toArray.toSeq)
    val s = ChrF.orderStats(ChrF.stripChars("abcde"), ChrF.stripChars("abcdf"), 6)
    assert(s.toSeq == Seq((5L, 5L, 4L), (4L, 4L, 3L), (3L, 3L, 2L),
      (2L, 2L, 1L), (1L, 1L, 0L), (0L, 0L, 0L)))
  }
}
