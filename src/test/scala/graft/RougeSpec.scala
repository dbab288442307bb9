package graft

import graft.ext.Rouge

/** Hand-computed coverage for [[graft.ext.Rouge]] (ROUGE-L): every LCS
  * value checkable by eye, plus the Bleu-convention null semantics. */
class RougeSpec extends SparkSpec {
  import spark.implicits._

  private def pairs = Seq(
    (1L, "the cat sat on the mat", "the cat ran on a mat"), // LCS the,cat,on,mat = 4
    (2L, "a b c d", "x y z"),                               // disjoint: 0
    (3L, "hello world", "hello world"),                     // identical: 2
    (4L, "z z z a b", "a b z z z"),                         // order matters: 3 (z z z)
    (5L, "   ", "a b"),                                     // empty candidate
    (6L, "a b", "   ")                                      // empty reference
  ).toDF("pair_id", "candidate", "reference")

  test("rougeL: hand-computed LCS, canonized R/P/F") {
    val out = Rouge.rougeL(pairs).collect().map(r =>
      r.getAs[Long]("pair_id") -> ((r.getAs[Long]("c_len"), r.getAs[Long]("r_len"),
        r.getAs[Long]("lcs_len"), Option(r.getAs[java.lang.Double]("rouge_r")),
        Option(r.getAs[java.lang.Double]("rouge_p")),
        Option(r.getAs[java.lang.Double]("rouge_f"))))).toMap
    assert(out(1L) == ((6L, 6L, 4L, Some(0.666667), Some(0.666667), Some(0.666667))),
      s"got ${out(1L)}")
    assert(out(2L) == ((4L, 3L, 0L, Some(0.0), Some(0.0), Some(0.0))), s"got ${out(2L)}")
    assert(out(3L) == ((2L, 2L, 2L, Some(1.0), Some(1.0), Some(1.0))), s"got ${out(3L)}")
    assert(out(4L) == ((5L, 5L, 3L, Some(0.6), Some(0.6), Some(0.6))), s"got ${out(4L)}")
    // empty candidate: P and F null, R = 0; empty reference: R and F null
    assert(out(5L) == ((0L, 2L, 0L, Some(0.0), None, None)), s"got ${out(5L)}")
    assert(out(6L) == ((2L, 0L, 0L, None, Some(0.0), None)), s"got ${out(6L)}")
  }

  test("rougeL: null sides dropped; asymmetric lengths give R != P") {
    val p = Seq((1L, Option("a b c d"), Option("a b")),
        (2L, Option.empty[String], Option("x")),
        (3L, Option("x"), Option.empty[String]))
      .toDF("pair_id", "candidate", "reference")
    val out = Rouge.rougeL(p).collect()
    assert(out.map(_.getAs[Long]("pair_id")).toSet == Set(1L))
    val r = out(0)
    // LCS = 2: R = 2/2 = 1, P = 2/4 = 0.5, F = 2*.5*1/1.5 = 0.666667
    assert(r.getAs[Double]("rouge_r") == 1.0 && r.getAs[Double]("rouge_p") == 0.5)
    assert(r.getAs[Double]("rouge_f") == 0.666667)
  }

  test("lcsLen kernel: symmetry and subsequence (not substring) semantics") {
    def l(a: String, b: String) =
      Rouge.lcsLen(a.split(" "), b.split(" "))
    assert(l("a x b y c", "a b c") == 3) // gaps allowed
    assert(l("a b c", "a x b y c") == 3) // symmetric
    assert(l("a a a", "a a") == 2)       // multiplicity respected
    assert(l("c b a", "a b c") == 1)     // reversal: only one survives
  }

  test("rougeL is deterministic under input order") {
    val shuffled = pairs.orderBy(org.apache.spark.sql.functions.rand(13))
    val a = Rouge.rougeL(pairs).orderBy("pair_id").collect().map(_.toString).toSeq
    val b = Rouge.rougeL(shuffled).orderBy("pair_id").collect().map(_.toString).toSeq
    assert(a == b)
  }
}
