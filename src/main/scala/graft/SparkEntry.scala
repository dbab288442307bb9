package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Panel, Tables}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Conventions shared by every query/oracle pair:
  *   - every floating-point output column is `round(x, 6)` on BOTH sides so
  *     the driver's hash compare is robust to summation-order ulp drift;
  *   - every computed column is aliased identically in Spark and SQL;
  *   - every query ends in a deterministic ORDER BY.
  */
object SparkEntry {

  private def round6(c: String): Column = round(col(c), 6).as(c)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Distribution diagnostics (SURVEY §7.2) over the events panel. */
  def entry(spark: SparkSession): DataFrame =
    distributionEvents(spark, "/root/testdata/sf0.001")

  // ---- G2: distribution diagnostics ---------------------------------------

  private def distributionEvents(s: SparkSession, dir: String): DataFrame = {
    val melted = Panel.melt(Tables.events(s, dir), "ts", Seq("event_type"), Seq("value"))
    Moments
      .distributionDiagnostics(melted)
      .select(col("group_key"), col("feature"), col("n"),
        round6("mean"), round6("std"), round6("skew"), round6("kurtosis"))
      .orderBy("feature", "group_key")
  }

  private def distributionLineitem(s: SparkSession, dir: String): DataFrame = {
    val melted = Panel.melt(
      Tables.lineitem(s, dir), "l_shipdate", Seq("l_returnflag"),
      Seq("l_quantity", "l_extendedprice", "l_discount"))
    Moments
      .distributionDiagnostics(melted)
      .select(col("group_key"), col("feature"), col("n"),
        round6("mean"), round6("std"), round6("skew"), round6("kurtosis"))
      .orderBy("feature", "group_key")
  }

  // ---- G4: cross-sectional dispersion -------------------------------------

  /** Panel from events: one value per (day, event_type) = avg(value); then
    * per-date sample std across groups (time_series_study.py:437-472). */
  private def dispersionEvents(s: SparkSession, dir: String): DataFrame = {
    val panel = Tables.events(s, dir)
      .filter(Panel.finite(col("value")))
      .groupBy(date_trunc("day", col("ts")).as("date"), col("event_type"))
      .agg(avg("value").as("value"))
    panel.groupBy("date")
      .agg(round(stddev_samp("value"), 6).as("dispersion_value"))
      .orderBy("date")
  }

  // ---- F6/G6: z-score outlier summary -------------------------------------

  /** Per-group z-score outliers, |z| > 3 with population σ
    * (time_series_study.py:932-936, ddof=0), summarized per group
    * (:941-954). Stats table is tiny → broadcast join back onto events;
    * two scans, zero wide shuffles. */
  private def zscoreOutliers(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(Panel.finite(col("value")))
      .select("event_type", "value")
    val stats = ev.groupBy("event_type")
      .agg(avg("value").as("mu"), stddev_pop("value").as("sigma"))
    val z = ev.join(broadcast(stats), "event_type")
      .withColumn("z", abs((col("value") - col("mu")) / col("sigma")))
    z.groupBy(col("event_type").as("group_key"))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("z") > 3, lit(1))).as("n_outliers"),
        round(avg(when(col("z") > 3, 1.0).otherwise(0.0)), 6).as("outlier_rate"),
        round(max(col("z")), 6).as("max_z"))
      .orderBy("group_key")
  }

  // ---- registry -----------------------------------------------------------

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_distribution_events" -> distributionEvents,
    "q_distribution_lineitem" -> distributionLineitem,
    "q_dispersion_events" -> dispersionEvents,
    "q_zscore_outliers" -> zscoreOutliers,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_distribution_events" ->
      """SELECT event_type AS group_key, 'value' AS feature, count(value) AS n,
        |round(avg(value), 6) AS mean, round(stddev_samp(value), 6) AS std,
        |round(skewness(value), 6) AS skew, round(kurtosis(value), 6) AS kurtosis
        |FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        |GROUP BY 1 ORDER BY feature, group_key""".stripMargin,
    "q_distribution_lineitem" -> {
      def one(f: String) =
        s"""SELECT l_returnflag AS group_key, '$f' AS feature, count($f) AS n,
           |round(avg($f), 6) AS mean, round(stddev_samp($f), 6) AS std,
           |round(skewness($f), 6) AS skew, round(kurtosis($f), 6) AS kurtosis
           |FROM lineitem WHERE $f IS NOT NULL AND NOT isnan($f) GROUP BY 1""".stripMargin
      Seq("l_quantity", "l_extendedprice", "l_discount").map(one)
        .mkString("", " UNION ALL ", " ORDER BY feature, group_key")
    },
    "q_dispersion_events" ->
      """WITH panel AS (
        |  SELECT date_trunc('day', ts) AS date, event_type, avg(value) AS value
        |  FROM events WHERE value IS NOT NULL AND NOT isnan(value) GROUP BY 1, 2
        |) SELECT date, round(stddev_samp(value), 6) AS dispersion_value
        |FROM panel GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_zscore_outliers" ->
      """WITH s AS (
        |  SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sigma
        |  FROM events WHERE value IS NOT NULL AND NOT isnan(value) GROUP BY 1
        |), z AS (
        |  SELECT e.event_type, abs((e.value - s.mu) / s.sigma) AS z
        |  FROM events e JOIN s USING (event_type)
        |  WHERE e.value IS NOT NULL AND NOT isnan(e.value)
        |)
        |SELECT event_type AS group_key, count(*) AS n,
        |count(*) FILTER (WHERE z > 3) AS n_outliers,
        |round(avg(CASE WHEN z > 3 THEN 1.0 ELSE 0.0 END), 6) AS outlier_rate,
        |round(max(z), 6) AS max_z
        |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
