package graft

import graft.ext.Search

class SearchSpec extends SparkSpec {
  import spark.implicits._

  // Hand-checkable corpus: 4 docs, one query term rare ("vector"), one
  // common ("table").
  private def corpus = Seq(
    (1L, "table scan table merge table"),          // dl=5, table x3
    (2L, "vector search over the table"),          // dl=5, vector x1 table x1
    (3L, "merge sort merge join"),                 // dl=4, merge x2
    (4L, "totally unrelated words here")           // dl=4, no hits
  ).toDF("doc_id", "text")

  test("bm25: rare term outweighs common term at equal tf, no-hit docs absent") {
    val scores = Search.bm25Scores(corpus, Seq("vector", "table"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_terms_hit"), r.getAs[Double]("score"))).toMap
    assert(!scores.contains(3L) && !scores.contains(4L), s"no-hit docs present: $scores")
    assert(scores(2L)._1 == 2L && scores(1L)._1 == 1L)
    // N=4: idf(vector, df=1) = ln(1+3.5/1.5) > idf(table, df=2) = ln(1+2.5/2.5);
    // doc 2 holds both terms at tf=1 and must beat doc 1's table-only tf=3
    // (tf saturates at k1=1.2: 3*2.2/(3+~1.2) < 2x the tf=1 weight).
    assert(scores(2L)._2 > scores(1L)._2,
      s"rare-term doc should outrank common-term doc: $scores")
  }

  test("bm25 hand-computed score matches the closed form") {
    val n = 4.0; val avgdl = 18.0 / 4.0
    def w(tf: Double, dl: Double, df: Double): Double =
      math.log(1 + (n - df + 0.5) / (df + 0.5)) *
        tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val expected1 = w(3, 5, 2) // doc 1: table x3, df(table)=2
    val got = Search.bm25Scores(corpus, Seq("vector", "table"))
      .filter($"doc_id" === 1L).collect()(0).getAs[Double]("score")
    assert(math.abs(got - expected1) < 1e-12, s"got $got want $expected1")
  }

  test("bm25TopK: deterministic (score desc, id asc) cut; k respected") {
    val top = Search.bm25TopK(corpus, Seq("vector", "table", "merge"), k = 2)
      .collect().map(_.getAs[Long]("doc_id"))
    assert(top.length == 2)
    // ties (if any at 6-decimal resolution) break by ascending id, and
    // rerunning yields the identical cut
    val again = Search.bm25TopK(corpus, Seq("vector", "table", "merge"), k = 2)
      .collect().map(_.getAs[Long]("doc_id"))
    assert(top.sameElements(again))
  }

  test("bm25: null and empty text score no hits without crashing") {
    val df = Seq((1L, "table merge"), (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("doc_id", "text")
    val ids = Search.bm25Scores(df, Seq("table")).collect().map(_.getAs[Long]("doc_id"))
    assert(ids.sameElements(Array(1L)), s"got ${ids.toSeq}")
  }

  test("rrf: hand-computed fusion of two rankings; missing doc contributes nothing") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val fused = Search.rrfFuse(Seq(a, b))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_rankings"), r.getAs[Double]("rrf"))).toMap
    assert(fused(20L)._1 == 2L && fused(10L)._1 == 1L)
    assert(math.abs(fused(20L)._2 - (1.0 / 61 + 1.0 / 62)) < 1e-15)
    assert(math.abs(fused(40L)._2 - 1.0 / 62) < 1e-15)
    // rank-1 in both beats rank-1 in one: fusion rewards agreement
    assert(fused(20L)._2 > fused(10L)._2)
  }

  test("hybridTopK: deterministic cut, k respected, ties by id") {
    val a = Seq((10L, 1), (20L, 2)).toDF("doc_id", "rank")
    val b = Seq((20L, 2), (10L, 1)).toDF("doc_id", "rank")
    // symmetric rankings -> 10 and 20 tie exactly; id breaks the tie
    val top = Search.hybridTopK(Seq(a, b), k = 1)
      .collect().map(_.getAs[Long]("doc_id"))
    assert(top.sameElements(Array(10L)))
  }

  test("bm25: duplicate query terms are deduplicated, not double-counted") {
    val a = Search.bm25Scores(corpus, Seq("table", "table"))
      .filter($"doc_id" === 1L).collect()(0).getAs[Double]("score")
    val b = Search.bm25Scores(corpus, Seq("table"))
      .filter($"doc_id" === 1L).collect()(0).getAs[Double]("score")
    assert(a == b)
  }
}
