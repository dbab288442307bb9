package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical panel layout helpers (SURVEY.md §1.1).
  *
  * A panel is a long-format DataFrame with a `date` timestamp column, zero or
  * more group-key columns, and one or more numeric feature columns
  * (reference: time_series_study/time_series_study.py:22-74). The melted view
  * `(date, group_key, feature, value)` is the working layout for
  * per-(group × feature) kernels: Spark shuffles once on
  * (group_key, feature) and every kernel runs partition-local after that.
  */
object Panel {

  /** Degenerate group label when the panel has no group columns
    * (time_series_study.py:19,83). */
  val AllGroups = "__ALL__"

  /** Stringified group key — ":"-joined values (time_series_study.py:19). */
  def groupKey(groupCols: Seq[String]): Column =
    if (groupCols.isEmpty) lit(AllGroups)
    else concat_ws(":", groupCols.map(c => col(c).cast(StringType)): _*)

  /** pandas `dropna()` drops both null and NaN; Spark must filter both to
    * match (SURVEY.md §1.2). */
  def finite(c: Column): Column = c.isNotNull && !isnan(c)

  /** Wide panel → melted `(date, group_key, feature, value)`.
    *
    * Uses `stack` so the projection stays inside whole-stage codegen; the
    * parquet scan reads only (dateCol, groupCols, features).
    */
  def melt(
      df: DataFrame,
      dateCol: String,
      groupCols: Seq[String],
      features: Seq[String]): DataFrame = {
    require(features.nonEmpty, "melt requires at least one feature column")
    val stackExpr = features
      .map(f => s"'$f', cast(`$f` as double)")
      .mkString(s"stack(${features.length}, ", ", ", ") as (feature, value)")
    df.select(
      col(dateCol).cast(TimestampType).as("date"),
      groupKey(groupCols).as("group_key"),
      expr(stackExpr))
  }

  /** Construct-time schema validation mirroring the reference
    * (time_series_study.py:48-74; weighted_bin_calculator.py:55-59). */
  def requireColumns(df: DataFrame, cols: Seq[String]): Unit = {
    val missing = cols.filterNot(df.columns.contains)
    require(
      missing.isEmpty,
      s"DataFrame must contain columns: ${missing.mkString(", ")} (have: ${df.columns.mkString(", ")})")
  }

  /** All feature columns must be numeric (time_series_study.py:70-72). */
  def requireNumeric(df: DataFrame, cols: Seq[String]): Unit = {
    val bad = cols.filter { c =>
      !df.schema(c).dataType.isInstanceOf[NumericType]
    }
    require(bad.isEmpty, s"All feature columns must be numeric; non-numeric: ${bad.mkString(", ")}")
  }
}
