package graft

import graft.ext.IrEval

/** Hand-computed coverage for [[IrEval.evalRanking]]. Run: query 1
  * retrieved docs 10, 11, 12, 13 at ranks 1–4; query 2 docs 20, 21;
  * query 3 docs 30. Qrels: query 1 → {11, 13, 99}; query 2 → {50};
  * query 3 has none. */
class IrEvalSpec extends SparkSpec {

  import spark.implicits._

  private def run = Seq(
    (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4),
    (2L, 20L, 1), (2L, 21L, 2),
    (3L, 30L, 1)
  ).toDF("query_id", "doc_id", "rank")

  private def qrels = Seq(
    (1L, 11L), (1L, 13L), (1L, 99L), (1L, 11L), // duplicate row: deduped
    (2L, 50L)
  ).toDF("query_id", "doc_id")

  private def r6(x: Double) = math.rint(x * 1e6) / 1e6

  test("metrics at k=3 match the hand computation") {
    val out = IrEval.evalRanking(run, qrels, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    val d = IrEval.discounts(3)
    val idcg = IrEval.idealDcg(3)
    // query 1: top-3 = {10, 11, 12}; relevant hit 11@2 only (13 is rank 4,
    // 99 unretrieved). mrr 1/2, recall 1/3, ndcg = disc(2)/idcg(3).
    // query 2: no relevant in top 3 → zeros. query 3: no qrels → absent.
    assert(out == Seq(
      (1L, 3L, 1L, 0.5, r6(1.0 / 3), r6(d(1) / idcg(2))),
      (2L, 1L, 0L, 0.0, 0.0, 0.0)))
  }

  test("cutoff k=1 and a rank-1 hit give perfect mrr and the single-discount ndcg") {
    val out = IrEval.evalRanking(
      Seq((7L, 5L, 1), (7L, 6L, 2)).toDF("query_id", "doc_id", "rank"),
      Seq((7L, 5L)).toDF("query_id", "doc_id"), k = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // n_rel = 1 ≤ k: recall 1, ndcg = disc(1)/idcg(1) = 1
    assert(out.toSeq == Seq((7L, 1.0, 1.0, 1.0)))
  }

  test("recall is bounded by n_rel even when n_rel exceeds k") {
    val out = IrEval.evalRanking(run, qrels, k = 2)
      .filter("query_id = 1")
      .collect().map(r => (r.getLong(2), r.getDouble(4), r.getDouble(5))).toSeq
    val d = IrEval.discounts(2)
    val idcg = IrEval.idealDcg(2)
    // top-2 = {10, 11}: one hit of three relevants; ideal DCG truncates at k
    assert(out == Seq((1L, r6(1.0 / 3), r6(d(1) / idcg(1)))))
  }

  test("validation raises on non-positive k") {
    intercept[IllegalArgumentException](IrEval.evalRanking(run, qrels, k = 0))
  }

  test("bootstrapCiMean: constant metric collapses the CI onto the mean") {
    val pq = Seq((1L, 0.5), (2L, 0.5), (3L, 0.5)).toDF("query_id", "ndcg")
    val r = IrEval.bootstrapCiMean(pq, "ndcg", b = 50).collect()(0)
    assert(r.getAs[Double]("mean") == 0.5 &&
      r.getAs[Double]("ci_lower") == 0.5 && r.getAs[Double]("ci_upper") == 0.5)
    assert(r.getAs[Long]("n_queries") == 3L && r.getAs[Long]("n_resamples") == 50L)
  }

  test("bootstrapCiMean: deterministic, ordered, bounded by the value range") {
    val pq = Seq((1L, 0.0), (2L, 0.2), (3L, 0.9), (4L, 1.0), (5L, 0.4))
      .toDF("query_id", "m")
    val a = IrEval.bootstrapCiMean(pq, "m", b = 100).collect()(0)
    val b2 = IrEval.bootstrapCiMean(pq, "m", b = 100).collect()(0)
    assert(a == b2, s"non-deterministic: $a vs $b2")
    val (lo, hi) = (a.getAs[Double]("ci_lower"), a.getAs[Double]("ci_upper"))
    assert(lo <= hi && lo >= 0.0 && hi <= 1.0, s"got $a")
  }

  test("bootstrapCiMean: b = 1 degenerates to the single resample mean; null metrics drop") {
    val pq = Seq((1L, Some(0.8)), (2L, None)).toDF("query_id", "m")
    val r = IrEval.bootstrapCiMean(pq, "m", b = 1).collect()(0)
    // one query survives; every pick hits it
    assert(r.getAs[Long]("n_queries") == 1L)
    assert(r.getAs[Double]("mean") == 0.8 &&
      r.getAs[Double]("ci_lower") == 0.8 && r.getAs[Double]("ci_upper") == 0.8)
  }

  test("bootstrapCiMean validation") {
    val pq = Seq((1L, 0.5)).toDF("query_id", "m")
    intercept[IllegalArgumentException](IrEval.bootstrapCiMean(pq, "m", b = 0))
    intercept[IllegalArgumentException](IrEval.bootstrapCiMean(pq, "m", level = 1.0))
  }

  test("passAtK: hand-computed unbiased estimator, short-circuits, n<k exclusion") {
    // p1: n=5 c=2; p2: n=4 c=0; p3: n=3 c=3; p4: n=2 c=1
    val samples = (Seq.fill(2)((1L, true)) ++ Seq.fill(3)((1L, false)) ++
      Seq.fill(4)((2L, false)) ++ Seq.fill(3)((3L, true)) ++
      Seq((4L, true), (4L, false))).toDF("problem_id", "correct")
    val out = IrEval.passAtK(samples, ks = Seq(1, 2, 5)).collect()
      .map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("n_problems"), r.getAs[Double]("pass_at_k")))).toMap
    // k=1: (0.4 + 0 + 1 + 0.5)/4; p3 short-circuits (n-c=0 < 1)
    assert(out(1L) == ((4L, 0.475)), s"got ${out(1L)}")
    // k=2: p1 1-(3/5)(2/4)=0.7, p2 0, p3/p4 short-circuit to 1.0
    assert(out(2L) == ((4L, 0.675)), s"got ${out(2L)}")
    // k=5: only p1 has n >= 5, and n-c=3 < 5 -> 1.0
    assert(out(5L) == ((1L, 1.0)), s"got ${out(5L)}")
    intercept[IllegalArgumentException](IrEval.passAtK(samples, ks = Seq(0)))
    intercept[IllegalArgumentException](IrEval.passAtK(samples, ks = Seq(2, 2)))
  }
}
