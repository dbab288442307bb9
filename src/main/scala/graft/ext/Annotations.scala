package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-annotator label aggregation — the labeling-pipeline ops that sit
  * upstream of every supervised filter this library trains (the quality
  * classifier's `y`, label propagation's seeds, nearest-centroid's
  * fit labels): collapse redundant human/model votes to one consensus
  * label per item, and score each annotator against that consensus.
  * Majority vote is the standard baseline the annotator-quality EM
  * literature starts from (Dawid & Skene 1979 §1 — their EM's init IS
  * majority vote; Snorkel-style weak supervision reports against it),
  * and per-annotator agreement-with-consensus is the monitoring number
  * labeling ops teams track per batch (pair it with
  * [[Classifier.agreementKappa]] for the chance-corrected version
  * between two specific annotators).
  *
  * Scale shape: everything is keyed — one (item, label) count aggregate
  * (map-combinable), a per-item argmax window PARTITIONED by item (never
  * global), an item-keyed totals join, and an annotator-keyed aggregate
  * for quality. Nothing is ever annotator-set × corpus shaped; a viral
  * item (millions of votes on one id) skews one partition of the count
  * aggregate and is exactly the AQE skew case.
  *
  * Determinism: consensus ties break (n_votes desc, label asc) — the
  * library's standard lexicographic tie rule — and vote fractions /
  * agreement rates are 1e-6-canonized, so the consensus labeling is a
  * pure function of the vote multiset on any engine. Null labels are
  * dropped before counting (an abstention, not a vote); duplicate
  * (item, annotator) rows count as separate votes — dedup upstream if
  * the protocol forbids re-voting. */
object Annotations {

  private def quantC(c: org.apache.spark.sql.Column) =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Consensus label per item by majority vote. Output:
    * (idCol, label, n_votes, n_total, vote_frac) — the winning label,
    * its vote count, the item's total (non-null) votes, and the
    * canonized winning fraction (the per-item confidence a curation
    * threshold cuts on). */
  def majorityVote(votes: DataFrame,
      idCol: String = "doc_id",
      annotatorCol: String = "annotator",
      labelCol: String = "label"): DataFrame = {
    val v = votes.filter(col(labelCol).isNotNull)
      .select(col(idCol), col(labelCol).as("label"))
    val counts = v.groupBy(col(idCol), col("label"))
      .agg(count(lit(1)).as("n_votes"))
    val totals = v.groupBy(col(idCol)).agg(count(lit(1)).as("n_total"))
    counts
      .withColumn("rn", row_number().over(
        Window.partitionBy(idCol).orderBy(col("n_votes").desc, col("label").asc)))
      .filter(col("rn") === 1)
      .join(totals, idCol)
      .select(col(idCol), col("label"), col("n_votes"), col("n_total"),
        quantC(col("n_votes") / col("n_total")).as("vote_frac"))
  }

  /** Accuracy-weighted vote — the one-half-EM-step upgrade of
    * [[majorityVote]] (Dawid & Skene's first iteration collapsed to a
    * scalar reliability; the log-odds weights are the Nitzan–Paroush
    * 1982 optimal-committee rule): each annotator's vote counts
    * w_a = ln(α_a / (1 − α_a)), with α_a the annotator's agreement rate
    * against a prior consensus ([[annotatorQuality]]'s output, or a gold
    * frame). A reliable annotator outvotes several mediocre ones; a
    * worse-than-chance annotator (α < 0.5) gets a NEGATIVE weight — its
    * vote counts against its own label, exactly what the optimal rule
    * prescribes. α is clamped to [0.01, 0.99] before the log-odds so a
    * perfect-agreement annotator cannot produce an infinite weight
    * (clamp documented, not silent: the weight saturates at ±ln 99).
    *
    * Determinism: weights are 1e-6-canonized BEFORE the per-(item,
    * label) sum and the summed score is canonized again before the
    * argmax ((score desc, label asc) tie rule), so both engines replay
    * identical decisions — the classifier-trainer lockstep convention.
    * Same keyed-aggregate scale shape as [[majorityVote]]; the quality
    * frame is annotator-count-sized and broadcasts. Output:
    * (idCol, label, score, n_votes). */
  def weightedVote(votes: DataFrame, quality: DataFrame,
      idCol: String = "doc_id",
      annotatorCol: String = "annotator",
      labelCol: String = "label"): DataFrame = {
    val alpha = least(greatest(col("agreement").cast("double"), lit(0.01)), lit(0.99))
    val w = quality.select(col(annotatorCol),
      quantC(log(alpha / (lit(1.0) - alpha))).as("w"))
    val v = votes.filter(col(labelCol).isNotNull)
      .select(col(idCol), col(annotatorCol), col(labelCol).as("label"))
      .join(broadcast(w), annotatorCol)
    v.groupBy(col(idCol), col("label"))
      .agg(quantC(sum(col("w"))).as("score"), count(lit(1)).as("n_votes"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(idCol).orderBy(col("score").desc, col("label").asc)))
      .filter(col("rn") === 1)
      .select(col(idCol), col("label"), col("score"), col("n_votes"))
  }

  /** Per-annotator quality against a consensus labeling (e.g.
    * [[majorityVote]]'s output, or a gold frame): vote count and the
    * canonized agreement rate. Items without a consensus row score
    * nothing (inner join — same unscoreable-id contract as
    * [[Classifier.perClassMetrics]]). Note the majority-vote consensus
    * includes each annotator's own vote; with ≥ 3 annotators of
    * comparable volume the self-vote bias is bounded by 1/annotators —
    * use a gold frame when an unbiased read matters. */
  def annotatorQuality(votes: DataFrame, consensus: DataFrame,
      idCol: String = "doc_id",
      annotatorCol: String = "annotator",
      labelCol: String = "label"): DataFrame = {
    val v = votes.filter(col(labelCol).isNotNull)
      .select(col(idCol), col(annotatorCol), col(labelCol).as("vl"))
    val c = consensus.select(col(idCol), col(labelCol).as("cl"))
    v.join(c, idCol)
      .groupBy(col(annotatorCol))
      .agg(count(lit(1)).as("n_votes"),
        quantC(avg(when(col("vl") === col("cl"), 1.0).otherwise(0.0)))
          .as("agreement"))
      .orderBy(annotatorCol)
  }
}
