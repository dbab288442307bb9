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

  // ---- tf-idf vector-space model -------------------------------------------

  test("tfidfPostings: hand-computed weights and unit L2 document norms") {
    val p = Search.tfidfPostings(corpus).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term")) ->
        (r.getAs[Long]("tf"), r.getAs[Double]("tfidf"), r.getAs[Double]("tfidf_norm")))
      .toMap
    // doc 1 = "table scan table merge table": tf(table)=3, df(table)=2, N=4
    val idfTable = math.log(5.0 / 3.0) + 1.0
    val idfScan = math.log(5.0 / 2.0) + 1.0   // df=1
    val idfMerge = math.log(5.0 / 3.0) + 1.0  // df=2 (docs 1, 3)
    assert(p((1L, "table"))._1 == 3L)
    assert(math.abs(p((1L, "table"))._2 - 3 * idfTable) < 1e-12)
    val norm1 = math.sqrt(math.pow(3 * idfTable, 2) + math.pow(idfScan, 2)
      + math.pow(idfMerge, 2))
    assert(math.abs(p((1L, "table"))._3 - 3 * idfTable / norm1) < 1e-12)
    // every document vector is unit-norm
    Search.tfidfPostings(corpus).groupBy($"doc_id")
      .agg(org.apache.spark.sql.functions.sum($"tfidf_norm" * $"tfidf_norm").as("n2"))
      .collect().foreach(r =>
        assert(math.abs(r.getAs[Double]("n2") - 1.0) < 1e-12, r.toString))
  }

  test("tfidfTopK: cosine ranking, OOV query terms dropped, no-hit docs absent") {
    val top = Search.tfidfTopK(corpus, Seq("vector", "table", "nosuchterm"), k = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_terms_hit"), r.getAs[Double]("score")))
    val byId = top.toMap
    // docs 3 and 4 contain neither query term
    assert(!byId.contains(3L) && !byId.contains(4L), top.toSeq.toString)
    // doc 2 holds the rare term + table; doc 1 is table-heavy but its norm
    // is dominated by table so its cosine against the mixed query is lower
    // on the vector axis; both scores are valid cosines in [0, 1]
    assert(byId.values.forall(v => v._2 >= 0.0 && v._2 <= 1.0 + 1e-9), top.toSeq.toString)
    assert(byId(2L)._1 == 2L && byId(1L)._1 == 1L)
    // hand-check doc 1's cosine: query vector (vector, table) at q_tf=1
    val idfTable = math.log(5.0 / 3.0) + 1.0
    val idfVector = math.log(5.0 / 2.0) + 1.0
    val qnorm = math.sqrt(idfTable * idfTable + idfVector * idfVector)
    val idfScan = math.log(5.0 / 2.0) + 1.0
    val idfMerge = math.log(5.0 / 3.0) + 1.0
    val norm1 = math.sqrt(math.pow(3 * idfTable, 2) + math.pow(idfScan, 2)
      + math.pow(idfMerge, 2))
    val want1 = (3 * idfTable / norm1) * (idfTable / qnorm)
    assert(math.abs(byId(1L)._2 - want1) < 1e-6, s"got ${byId(1L)._2} want $want1")
  }

  test("tfidfTopK: query built from persisted postings equals inline; dup terms raise q_tf") {
    val postings = Search.tfidfPostings(corpus)
    val inline = Search.tfidfTopK(corpus, Seq("merge", "table"), k = 3).collect()
    val fromPost = Search.tfidfTopKFromPostings(postings, Seq("merge", "table"), k = 3).collect()
    assert(inline.map(_.toString).sameElements(fromPost.map(_.toString)))
    // doubling a query term shifts query mass toward it: doc 3 (merge x2)
    // must rank strictly higher with the doubled merge query
    def scoreOf(terms: Seq[String], id: Long): Double =
      Search.tfidfTopK(corpus, terms, k = 4).collect()
        .find(_.getAs[Long]("doc_id") == id).map(_.getAs[Double]("score")).getOrElse(0.0)
    assert(scoreOf(Seq("merge", "merge", "table"), 3L) > scoreOf(Seq("merge", "table"), 3L))
  }

  test("tfidf: null text yields no postings; whitespace-only text still counts in N") {
    val df = Seq((1L, "table merge"), (2L, null.asInstanceOf[String]), (3L, "   "))
      .toDF("doc_id", "text")
    val p = Search.tfidfPostings(df)
    // null doc absent entirely; whitespace doc postings carry the "" term
    assert(!p.filter($"doc_id" === 2L).collect().nonEmpty)
    // N=2 (docs 1 and 3): idf(table) = ln(3/2)+1
    val w = p.filter($"doc_id" === 1L && $"term" === "table").collect()(0)
    assert(math.abs(w.getAs[Double]("tfidf") - (math.log(3.0 / 2.0) + 1.0)) < 1e-12)
  }

  // ---- pseudo-relevance feedback --------------------------------------

  // PRF corpus: "apple" retrieves docs 1-3; feedback top-2 (tie on score,
  // id asc) = docs 1, 2; candidates banana(r=2,df=3) cherry(r=1,df=2)
  // date(r=1,df=1); offer weights rank date > banana > cherry.
  private def prfCorpus = Seq(
    (1L, "apple banana cherry"),
    (2L, "apple banana date"),
    (3L, "apple elderberry fig"),
    (4L, "grape banana cherry"),
    (5L, "kiwi lemon mango")
  ).toDF("doc_id", "text")

  test("prf expands with the top offer-weight terms and re-ranks") {
    val out = Search.prfTopK(prfCorpus, Seq("apple"), k = 5,
        fbDocs = 2, fbTerms = 2, beta = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every dl = 3 = avgdl and every tf = 1, so the saturation factor is
    // exactly 1 and each hit contributes q_w * idf
    def idf(df: Double) = math.log(1 + (5.0 - df + 0.5) / (df + 0.5))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = Seq(
      (2L, 3L, r6(idf(3) + 0.5 * idf(1) + 0.5 * idf(3))), // apple date banana
      (1L, 2L, r6(idf(3) + 0.5 * idf(3))),                // apple banana
      (3L, 1L, r6(idf(3))),                               // apple
      (4L, 1L, r6(0.5 * idf(3))))                         // banana only
    assert(out.toSeq == expected, s"got ${out.toSeq}")
  }

  test("prf with fbTerms = 0 degenerates to plain bm25 ranking") {
    val prf = Search.prfTopK(prfCorpus, Seq("apple"), k = 3, fbDocs = 2, fbTerms = 0)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val plain = Search.bm25TopK(prfCorpus, Seq("apple"), k = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq
    assert(prf == plain)
  }

  test("prf validation raises on bad arguments") {
    intercept[IllegalArgumentException](
      Search.prfTopK(prfCorpus, Seq("apple"), k = 0))
    intercept[IllegalArgumentException](
      Search.prfTopK(prfCorpus, Seq("apple"), k = 1, fbDocs = 0))
    intercept[IllegalArgumentException](
      Search.prfTopK(prfCorpus, Seq("apple"), k = 1, beta = -0.1))
  }

  // ---- standing BM25 postings -----------------------------------------

  test("bm25 postings recover exact corpus stats, whitespace-only doc included") {
    val df = Seq((1L, "table merge"), (2L, null.asInstanceOf[String]), (3L, "   "))
      .toDF("doc_id", "text")
    val p = Search.bm25Postings(df)
    // null doc absent; whitespace doc carries one "" posting with dl=1
    assert(p.filter($"doc_id" === 2L).count() == 0)
    assert(p.filter($"doc_id" === 3L && $"term" === "").count() == 1)
    val st = Search.bm25StatsFromPostings(p).collect()(0)
    assert(st.getAs[Long]("n_docs") == 2L)
    assert(st.getAs[Double]("avgdl") == 3.0 / 2.0) // dl 2 and 1, exact
  }

  test("weighted bm25 from postings is bit-identical to the corpus-scan scorer") {
    val weights = Seq(("table", 1.0), ("merge", 0.5)).toDF("term", "q_w")
    val postings = Search.bm25Postings(corpus)
    val stats = Search.bm25StatsFromPostings(postings)
    val scan = Search.bm25ScoresWeighted(corpus, weights)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val idx = Search.bm25ScoresWeightedFromPostings(postings, stats, weights)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(scan.toSeq == idx.toSeq, s"scan=${scan.toSeq} idx=${idx.toSeq}")
  }

  test("prf from standing postings equals the corpus-scan prf, all three passes") {
    val postings = Search.bm25Postings(prfCorpus)
    val stats = Search.bm25StatsFromPostings(postings)
    val scan = Search.prfTopK(prfCorpus, Seq("apple"), k = 5,
        fbDocs = 2, fbTerms = 2, beta = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val idx = Search.prfTopKFromPostings(postings, stats, Seq("apple"), k = 5,
        fbDocs = 2, fbTerms = 2, beta = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(scan.toSeq == idx.toSeq, s"scan=${scan.toSeq} idx=${idx.toSeq}")
    // fbTerms = 0 degenerate form agrees too (pure first-pass rank)
    val scan0 = Search.prfTopK(prfCorpus, Seq("apple"), k = 3, fbDocs = 2, fbTerms = 0)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val idx0 = Search.prfTopKFromPostings(postings, stats, Seq("apple"), k = 3,
        fbDocs = 2, fbTerms = 0)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(scan0 == idx0)
  }

  test("addDocsToPostings: batched appends equal the one-shot build bit-exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("postings_upsert")
    try {
      val dir = s"$tmp/postings"
      // three disjoint batches, including a null-text and a whitespace doc
      val all = prfCorpus.unionByName(
        Seq((100L, null.asInstanceOf[String]), (101L, "   ")).toDF("doc_id", "text"))
      Search.addDocsToPostings(all.filter($"doc_id" < 3), dir)
      Search.addDocsToPostings(all.filter($"doc_id" >= 3 && $"doc_id" < 100), dir)
      Search.addDocsToPostings(all.filter($"doc_id" >= 100), dir)
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
          r.getAs[Long]("tf"), r.getAs[Long]("dl"))).sorted.toSeq
      val appended = spark.read.parquet(dir)
      assert(rows(appended) == rows(Search.bm25Postings(all)))
      // recovered stats equal the one-shot build's (bit-exact doubles)
      val stA = Search.bm25StatsFromPostings(appended).collect()(0)
      val stO = Search.bm25StatsFromPostings(Search.bm25Postings(all)).collect()(0)
      assert(stA.getAs[Long]("n_docs") == stO.getAs[Long]("n_docs"))
      assert(stA.getAs[Double]("avgdl") == stO.getAs[Double]("avgdl"))
      // a PRF query over the appended store answers like the one-shot scan
      val scan = Search.prfTopK(all, Seq("apple"), k = 5, fbDocs = 2, fbTerms = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val idx = Search.prfTopKFromPostings(appended,
          Search.bm25StatsFromPostings(appended), Seq("apple"), k = 5,
          fbDocs = 2, fbTerms = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(scan == idx, s"scan=$scan idx=$idx")
      // compaction: fewer files, identical rows, identical query answers
      val filesBefore = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
      // the trigger read-out: footer-exact metadata, threshold flips the flag
      val st0 = Search.postingsStats(spark, dir, compactFileThreshold = filesBefore)
        .collect()(0)
      assert(st0.getAs[Long]("n_files") == filesBefore.toLong &&
        st0.getAs[Long]("total_rows") == rows(appended).length.toLong &&
        !st0.getAs[Boolean]("compact_recommended"), s"got $st0")
      val st1 = Search.postingsStats(spark, dir, compactFileThreshold = filesBefore - 1)
        .collect()(0)
      assert(st1.getAs[Boolean]("compact_recommended"), s"got $st1")
      Search.compactPostings(spark, dir, partitions = 2)
      val filesAfter = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
      assert(filesAfter <= 2 && filesAfter < filesBefore,
        s"expected <= 2 files after compaction, had $filesBefore -> $filesAfter")
      val compacted = spark.read.parquet(dir)
      assert(rows(compacted) == rows(Search.bm25Postings(all)))
      val idx2 = Search.prfTopKFromPostings(compacted,
          Search.bm25StatsFromPostings(compacted), Seq("apple"), k = 5,
          fbDocs = 2, fbTerms = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(idx2 == scan, s"compacted=$idx2 scan=$scan")
      // compaction restores health: file count drops, rows preserved, flag clears
      val st2 = Search.postingsStats(spark, dir, compactFileThreshold = filesBefore - 1)
        .collect()(0)
      assert(st2.getAs[Long]("n_files") == filesAfter.toLong &&
        st2.getAs[Long]("total_rows") == st0.getAs[Long]("total_rows") &&
        !st2.getAs[Boolean]("compact_recommended"), s"got $st2")
    } finally graft.core.Fs.rmTree(tmp)
  }
}
