package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword search over the corpus: BM25 ranking (Robertson–Spärck Jones
  * idf, Okapi tf saturation) computed as a relational plan — the
  * retrieval op of a training-data pipeline (query-relevance filtering,
  * seed-set expansion, eval-set retrieval).
  *
  * Scale shape (the 100 TB audit):
  *   - corpus statistics (N, avgdl) are ONE map-side-partial scalar
  *     aggregate over the corpus — no shuffle of document rows;
  *   - the token explode is filtered to QUERY TERMS in the same pipelined
  *     stage that produces it, so the only data crossing a shuffle
  *     boundary is (doc, query-term) hits — for a k-term query that is a
  *     tiny fraction of the corpus token stream, and the shuffle key
  *     (doc, term) cannot skew worse than one doc's repetitions of one
  *     term;
  *   - per-term document frequencies aggregate the already-tiny hit
  *     frame and come back as a broadcast;
  *   - no inverted index is materialized — at 100 TB an index build is a
  *     separate amortization decision, and ad-hoc scoring must not
  *     require one. For a standing index, the tf frame below IS the
  *     posting list: write it bucketed by term (sources/Bucketing) and
  *     the per-query plan drops the corpus scan entirely.
  *
  * Tokenization matches the repo-wide whitespace convention
  * (`split(lower(trim(text)), "\\s+")` — the same stream TextStats'
  * token counts, chunking, and the bigram LM score), so "document
  * length" means the same thing across every text operator.
  *
  * The idf is ln(1 + (N - df + 0.5)/(df + 0.5)) — the non-negative
  * variant used by Lucene; plain RSJ idf goes negative for df > N/2,
  * which the tiny synthetic vocabulary here would hit on every term.
  */
object Search {

  /** Score every document containing at least one of `queryTerms` and
    * return `(idCol, n_terms_hit, score)` rows. Downstream callers rank
    * with their own tie policy; `bm25TopK` below applies the library's
    * deterministic (score desc, id asc) one.
    *
    * Null/empty text scores no hits and is absent from the result (the
    * explode of an empty token array produces no rows) — same contract
    * as the fingerprint and n-gram ops. */
  def bm25Scores(docs: DataFrame, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k1 >= 0 && b >= 0 && b <= 1, s"need k1 >= 0, 0 <= b <= 1; got k1=$k1 b=$b")
    val terms = queryTerms.distinct
    // Null text must not reach the corpus stats: with ANSI off,
    // size(split(NULL)) is -1 and would silently corrupt avgdl for every
    // score (the DuckDB oracle skips NULLs). Same guard and rationale as
    // chunkByTokenBudget; the library doesn't pin spark.sql.ansi.enabled.
    val toks = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), split(lower(trim(col(textCol))), "\\s+").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    // One-row corpus stats frame, broadcast — stays inside the plan (no
    // driver collect): sum/count of longs is exact, so avgdl is the same
    // IEEE double on any engine.
    val stats = toks.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")) / count(lit(1))).as("avgdl"))
    // Pipelined explode+filter: only query-term hits reach the shuffle.
    val hits = toks
      .select(col(idCol), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isInCollection(terms))
    val tf = hits.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dft), "term")
      .join(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("w")).as("score"))
  }

  /** Reciprocal-rank fusion (published: Cormack, Clarke & Büttcher 2009)
    * of any number of rankings — the standard way to combine keyword
    * (BM25) and embedding (ANN) retrieval without score calibration:
    * rrf(d) = Σ over rankings r of 1/(kConst + rank_r(d)); a document
    * absent from a ranking contributes nothing.
    *
    * Each input frame carries (idCol, rankCol) with 1-based ranks —
    * i.e. any top-k result. Inputs are top-k frames, so everything here
    * is model-sized: the union + groupBy is a few hundred rows
    * regardless of corpus size; the heavy lifting happened in the
    * retrievers. With ≤2 rankings the per-doc sum adds at most two
    * doubles, so the score is order-independent bit-exact; beyond that
    * the repo-wide 1e-6 canon in [[hybridTopK]] absorbs ulp noise. */
  def rrfFuse(rankings: Seq[DataFrame], kConst: Int = 60,
      idCol: String = "doc_id", rankCol: String = "rank"): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(kConst >= 1, s"kConst must be >= 1, got $kConst")
    rankings
      .map(df => df.select(col(idCol),
        (lit(1.0) / (lit(kConst.toDouble) + col(rankCol))).as("rr")))
      .reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_rankings"), sum(col("rr")).as("rrf"))
  }

  /** Fused top-k: canon the RRF score to 6 decimals and cut by
    * (rrf desc, id asc) — the same deterministic rank rule as
    * [[bm25TopK]]. */
  def hybridTopK(rankings: Seq[DataFrame], k: Int, kConst: Int = 60,
      idCol: String = "doc_id", rankCol: String = "rank"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    rrfFuse(rankings, kConst, idCol, rankCol)
      .withColumn("rrf", floor(col("rrf") * lit(1e6) + lit(0.5)) / lit(1e6))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(k)
  }

  /** Top-k BM25 retrieval with the library's deterministic tie rule:
    * score descending, id ascending. Ranking happens on a 6-decimal
    * canonicalized score (floor(x*1e6+0.5)/1e6) so that the ORDER is a
    * function of values any engine reproduces bit-exactly — sub-1e-6
    * float noise cannot reorder the cut (same rationale as the repo-wide
    * oracle float canon). */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    bm25Scores(docs, queryTerms, k1, b, idCol, textCol)
      .withColumn("score", floor(col("score") * lit(1e6) + lit(0.5)) / lit(1e6))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
