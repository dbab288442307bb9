package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Physical-plan lint over EVERY driver query (round 7): walks each
  * query's non-adaptive physical plan (AQE's AdaptiveSparkPlanExec hides
  * its subtree from children-walks, so lint plans with AQE off) and
  * fails on the three classic scale-killers — unless the occurrence is
  * on the documented whitelist below. The whitelist is intent, not
  * amnesty: a NEW cartesian product, a NEW large-side nested-loop join,
  * or a NEW unpartitioned window in any query fails this spec loudly.
  *
  * Whitelisted-by-design:
  *   - BNLJ: the query-vs-corpus scoring joins broadcast a model-sized
  *     side (≤3 query vectors / a bounded replay fixture); a broadcast
  *     nested-loop with a tiny build side IS the right plan at 100 TB.
  *   - GLOBAL_WINDOW in q_rrf_hybrid_docs: the rank window runs over
  *     bm25TopK's already-cut top-25 frame — k rows at any corpus size.
  */
class PlanLintSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  private val bnljOk = Set(
    "q_bm25_topk_docs", "q_embedding_neardup_docs", "q_hashed_topk_docs",
    "q_jaccard_pairs_docs", "q_multimodal_embedding", "q_multimodal_replay",
    "q_quantized_topk", "q_rrf_hybrid_docs", "q_simhash_replay_docs",
    "q_similarity_topk_brute", "q_similarity_topk_lsh", "q_sql_functions_embeddings",
    // sketch queries: both join sides are ONE-row aggregates (the sketch
    // row + the exact-count row) — a broadcast loop over one row is the
    // model-sized case the whitelist exists for
    "q_kmv_distinct_lineitem", "q_hll_distinct_lineitem",
    // quantile read: the non-equi rank-vs-cumulative join broadcasts the
    // ≤16·60-row bucket table (and, in the exact exhibit leg, the
    // distinct-value cum table — value-cardinality-sized, bounded by max
    // doc length) against 5 quantile rows
    "q_hdr_quantiles_docs")
  private val globalWindowOk = Set("q_rrf_hybrid_docs",
    // cumulative walks over the model-sized bucket table / the
    // distinct-length table — never over data rows
    "q_hdr_quantiles_docs")

  test("no unlisted cartesian / nested-loop / unpartitioned-window in any driver query plan") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    // toggle AQE off on the SHARED suite session (a fresh builder's config
    // would be silently ignored by getOrCreate when another suite already
    // created the session); restore afterwards
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def walk(p: SparkPlan): Seq[SparkPlan] =
        p +: p.children.flatMap(walk) ++: p.subqueries.flatMap(walk)
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        val nodes = walk(fn(spark, sfDir).queryExecution.executedPlan)
        // blindness guard: if AQE still wrapped the plan, the walk sees
        // nothing — that's a broken lint, not a clean bill
        val blind = nodes.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec])
        (if (blind) Seq(s"$name: LINT_BLIND_AQE_PLAN") else Seq.empty) ++ nodes.flatMap {
          case w: WindowExec if w.partitionSpec.isEmpty && !globalWindowOk(name) =>
            Some(s"$name: GLOBAL_WINDOW")
          case _: CartesianProductExec => Some(s"$name: CARTESIAN")
          case _: BroadcastNestedLoopJoinExec if !bnljOk(name) => Some(s"$name: BNLJ")
          case _ => None
        }.distinct
      }
      assert(offenders.isEmpty, s"scale anti-patterns in driver plans:\n${offenders.mkString("\n")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
