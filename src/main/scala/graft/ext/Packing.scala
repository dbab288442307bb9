package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget packs — the
  * step that turns a filtered/deduped corpus into training batches.
  *
  * Semantics are BUDGET packing over a deterministic document order: pack
  * p holds the docs whose PRECEDING cumulative token count lies in
  * [p·capacity, (p+1)·capacity). A doc that straddles a boundary belongs
  * to the pack its first token falls in, so packs can overflow by at most
  * one document — the convention of streaming sequence packers, and (unlike
  * first-fit bin packing) a pure prefix-sum: one window pass, no
  * sequential fold, embarrassingly parallel per group and replayable in
  * ANSI SQL (the q_pack_docs oracle). */
object Packing {

  /** Add `pack_id` (0-based, per group) by cumulative token budget.
    * `orderCol` fixes the packing order (deterministic — never rely on
    * input order at scale); `groupCol` packs each group independently
    * (e.g. per language), `None` packs the whole corpus as one sequence
    * — fine for budget arithmetic but serializes the window, so prefer a
    * group key at scale. */
  def packByTokenBudget(df: DataFrame, tokenCol: String, orderCol: String,
      capacity: Long, groupCol: Option[String] = None): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    import org.apache.spark.sql.expressions.Window
    val base = groupCol.map(g => Window.partitionBy(col(g)))
      .getOrElse(Window.partitionBy())
    val w = base.orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("pack_id",
      floor((sum(col(tokenCol)).over(w) - col(tokenCol)) / lit(capacity)).cast("long"))
  }

  /** Per-pack summary (doc count, token sum) — the shape a batch loader
    * consumes; also the oracle surface. */
  def packSummary(packed: DataFrame, tokenCol: String,
      groupCol: Option[String] = None): DataFrame = {
    val keys: Seq[Column] = groupCol.map(col).toSeq :+ col("pack_id")
    packed.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_docs"), sum(col(tokenCol)).as("sum_tokens"))
  }
}
