package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the nearest-event temporal join (pandas `merge_asof`,
  * kdb `aj`) that Spark has no native operator for: for each left row,
  * attach THE one right row with the largest right ts <= left ts
  * (direction "backward"; exact matches allowed) or the smallest
  * right ts >= left ts ("forward"), per join key, optionally within a
  * tolerance interval.
  *
  * Mechanism — no range join, no per-key collect: tag both sides, UNION
  * them, and take a running `last(right-payload, ignoreNulls)` over ONE
  * window partitioned by the keys and ordered by (ts, side). That is
  * one shuffle on the join keys and a linear sorted scan per key —
  * the same (key, ts) sort-merge an ASOF physical operator performs,
  * so there is nothing for a custom SparkPlan to improve on here.
  * Right rows sort before left rows at equal ts, which is exactly
  * pandas' allow_exact_matches=True.
  *
  * Scale shape: skew is bounded by the hottest join key (same axis as
  * any keyed window — a hot key costs one task's sort, not a cross
  * product); tolerance is applied AFTER the match as a row-local
  * filter, so it never widens the plan.
  *
  * Precondition: the right side must be unique per (keys, ts) — with
  * duplicates, "the" as-of row is ill-defined and Spark's sort gives no
  * stable pick. Pre-aggregate the right side (e.g. `max_by`) first.
  */
object AsOf {

  /** @param payloadCols right-side columns to attach; each appears in
    *                    the output as `asof_<name>`, plus the matched
    *                    timestamp itself as `asof_ts` (all null when no
    *                    right row qualifies). The left frame must NOT
    *                    already contain columns named `asof_ts` or
    *                    `asof_<payload>` — the output would carry
    *                    duplicate names; rename upstream (same
    *                    disjoint-columns requirement as [[rangeJoin]]).
    * @param tolerance   optional max match distance as a SQL interval
    *                    string (e.g. "30 minutes"): a match farther than
    *                    this from the left ts is nulled out. */
  def asofJoin(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String, payloadCols: Seq[String],
      direction: String = "backward",
      tolerance: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "need at least one join key")
    require(payloadCols.nonEmpty, "need at least one payload column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")

    val rStructCol = struct(
      (col(tsCol).as("asof_ts") +: payloadCols.map(c => col(c).as(s"asof_$c"))): _*)
    val rType = right.select(rStructCol.as("__r")).schema("__r").dataType
    val lStructCol = struct(left.columns.map(col).toIndexedSeq: _*)

    val rTagged = right.select(
      keyCols.map(col) ++ Seq(col(tsCol).as("__ts"), lit(0).as("__side"),
        rStructCol.as("__r"), lit(null).cast(left.select(lStructCol.as("x"))
          .schema("x").dataType).as("__l")): _*)
    val lTagged = left.select(
      keyCols.map(col) ++ Seq(col(tsCol).as("__ts"), lit(1).as("__side"),
        lit(null).cast(rType).as("__r"), lStructCol.as("__l")): _*)

    // backward: ascending ts, running last right payload = nearest prior.
    // forward: descending ts, running last = nearest later. Right rows
    // (side 0) order before left at equal ts in both directions.
    val ordered =
      if (direction == "backward") Seq(col("__ts").asc, col("__side").asc)
      else Seq(col("__ts").desc, col("__side").asc)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordered: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched0 = last(col("__r"), ignoreNulls = true).over(w)
    val matched = tolerance match {
      case None => matched0
      case Some(t) =>
        val near =
          if (direction == "backward")
            col("__ts") - expr(s"INTERVAL $t") <= matched0.getField("asof_ts")
          else
            col("__ts") + expr(s"INTERVAL $t") >= matched0.getField("asof_ts")
        when(near, matched0)
    }
    rTagged.unionByName(lTagged)
      .withColumn("__m", matched)
      .filter(col("__side") === 1)
      .select(col("__l.*") +:
        (col("__m.asof_ts").as("asof_ts") +:
          payloadCols.map(c => col(s"__m.asof_$c").as(s"asof_$c"))): _*)
  }

  /** Interval (range) join: inner-join each left point row to every
    * right interval [startCol, endCol] of the same key containing its
    * timestamp — WITHOUT the BroadcastNestedLoop plan Spark produces for
    * a raw BETWEEN predicate. Intervals are exploded to the fixed-width
    * time buckets they cover and points equijoin their own bucket, then
    * the exact containment check runs row-local. A (point, interval)
    * pair can only meet in the point's bucket, so the equijoin emits no
    * duplicates and needs no distinct.
    *
    * Scale shape: shuffle keyed by (keys, bucket) — a hot key+hour is
    * one task, never a cross product. `bucketWidthSeconds` is the
    * explode-factor knob: each interval produces
    * ceil(length/width) + 1 rows; pick a width comparable to typical
    * interval length (e.g. hours for hour-scale windows). Intervals with
    * end < start are dropped (fail-loud would abort a 100 TB job over
    * one bad row — and SQL BETWEEN likewise matches nothing for them).
    * Intervals longer than `maxBucketsPerInterval` buckets are dropped
    * under the same policy: one far-future sentinel end (9999-12-31)
    * would otherwise make `sequence()` materialize millions of bucket
    * rows and OOM or hit Spark's array-length limit, aborting the job.
    * Raise the cap (or pre-clamp the ends) when genuinely huge
    * intervals are expected.
    *
    * Output: points' columns followed by the interval's (start, end,
    * payload) columns verbatim — callers must keep the two column sets
    * disjoint (rename upstream). */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], tsCol: String,
      startCol: String, endCol: String, payloadCols: Seq[String],
      bucketWidthSeconds: Long = 3600L,
      maxBucketsPerInterval: Long = 100000L): DataFrame = {
    require(keyCols.nonEmpty, "need at least one join key")
    require(bucketWidthSeconds > 0, s"bucketWidthSeconds must be > 0, got $bucketWidthSeconds")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be > 0, got $maxBucketsPerInterval")
    val wUs = bucketWidthSeconds * 1000000L
    val startBucket = floor(unix_micros(col(startCol)) / wUs).cast("long")
    val endBucket = floor(unix_micros(col(endCol)) / wUs).cast("long")
    val ivals = intervals
      .filter(col(endCol) >= col(startCol) &&
        endBucket - startBucket < lit(maxBucketsPerInterval))
      .select(keyCols.map(col) ++
        Seq(col(startCol), col(endCol)) ++ payloadCols.map(col) :+
        explode(sequence(startBucket, endBucket)).as("__bucket"): _*)
    val pts = points.withColumn("__bucket",
      floor(unix_micros(col(tsCol)) / wUs).cast("long"))
    pts.join(ivals, keyCols :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }
}
