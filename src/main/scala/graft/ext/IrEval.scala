package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation over a retrieval run — the TREC-style
  * harness (Järvelin & Kekäläinen 2002 for nDCG; MRR and recall@k as in
  * the standard trec_eval tool) that closes the retrieval stack: BM25 /
  * TF-IDF / ANN / MMR produce runs, this scores them against binary
  * qrels, per query.
  *
  * Metrics at cutoff k (binary relevance):
  *   - mrr_at_k      = 1 / rank of the first relevant hit (0 absent);
  *   - recall_at_k   = relevant hits in the top k / total relevant
  *                     (bounded below 1 when n_rel > k — the standard
  *                     definition, not "fraction of retrievable");
  *   - ndcg_at_k     = Σ 1/log₂(rank+1) over relevant hits, divided by
  *                     the ideal DCG for min(n_rel, k) relevants.
  *
  * Engine–oracle determinism: the log₂ discounts are NOT computed with
  * libm inside the plan — cross-engine `ln` differs by ulps (the
  * round-8 oracle lesson) — but shipped as a k-entry LITERAL table
  * computed once on the driver, with the cumulative ideal-DCG table
  * alongside; the SQL oracle embeds the same decimal strings, so both
  * engines divide identical IEEE doubles. Metrics are 1e-6-canonized at
  * output.
  *
  * Scale shape: the run is filtered to rank ≤ k BEFORE the qrels join
  * (k·Q rows); qrels aggregate to per-query counts map-side. Both joins
  * are query-keyed hash joins; nothing corpus-sized survives past the
  * run cut. Queries with no qrels row are absent from the output (no
  * denominator); queries with qrels but no hits score 0 across the
  * board via the left join. */
object IrEval {

  /** Per-rank DCG discount 1/log₂(rank+1), rank 1-based. */
  private[graft] def discounts(k: Int): Array[Double] =
    (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0))).toArray

  /** Cumulative ideal DCG: entry n (1-based) = Σ_{i≤n} discount(i). */
  private[graft] def idealDcg(k: Int): Array[Double] =
    discounts(k).scanLeft(0.0)(_ + _).tail.toArray

  /** Evaluate `run` (queryCol, docCol, rankCol — ranks 1-based, unique
    * per query) against binary `qrels` (queryCol, docCol). Output:
    * (query_id, n_rel, n_hits_at_k, mrr_at_k, recall_at_k, ndcg_at_k),
    * ordered by query. */
  def evalRanking(run: DataFrame, qrels: DataFrame, k: Int,
      queryCol: String = "query_id", docCol: String = "doc_id",
      rankCol: String = "rank"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val disc = discounts(k)
    val ideal = idealDcg(k)
    def r6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val qr = qrels
      .select(col(queryCol).cast("long").as("query_id"),
        col(docCol).cast("long").as("doc_id"))
      .filter(col("query_id").isNotNull && col("doc_id").isNotNull)
      .distinct()
    val nRel = qr.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val topk = run
      .select(col(queryCol).cast("long").as("query_id"),
        col(docCol).cast("long").as("doc_id"), col(rankCol).cast("int").as("rank"))
      .filter(col("rank") <= k)
    val hits = topk.join(qr, Seq("query_id", "doc_id"))
    val perQ = hits.groupBy("query_id").agg(
      min(col("rank")).as("first_rel"),
      count(lit(1)).as("n_hits_at_k"),
      sum(element_at(lit(disc), col("rank"))).as("dcg"))
    nRel.join(perQ, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"),
        coalesce(col("n_hits_at_k"), lit(0L)).as("n_hits_at_k"),
        r6(coalesce(lit(1.0) / col("first_rel"), lit(0.0))).as("mrr_at_k"),
        r6(coalesce(col("n_hits_at_k"), lit(0L)).cast("double")
          / col("n_rel")).as("recall_at_k"),
        r6(coalesce(col("dcg"), lit(0.0))
          / element_at(lit(ideal), least(col("n_rel"), lit(k.toLong)).cast("int")))
          .as("ndcg_at_k"))
      .orderBy("query_id")
  }
}
