package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Panel

/** K4 — Ljung–Box portmanteau test at a single max lag m
  * (time_series_study.py:327-331, statsmodels acorr_ljungbox lags=[m]):
  *
  *   ρ̂_k = Σ_{t>k}(x_t−x̄)(x_{t−k}−x̄) / Σ(x_t−x̄)²   (biased ACF, overall mean)
  *   Q = n(n+2) Σ_{k=1..m} ρ̂_k²/(n−k),   p = 1 − χ²_cdf(Q, m)
  *
  * Fully relational: m lag columns + one grouped aggregate — no kernel.
  * For even m the χ² survival function has the closed form
  * e^{−Q/2}·Σ_{j<m/2}(Q/2)^j/j!, a pure expression (and SQL-oracle-able);
  * the default m=10 is even.
  */
object LjungBox {

  /** Closed-form χ² survival function for even df (exact). */
  def chi2SfEven(q: Column, df: Int): Column = {
    require(df % 2 == 0 && df > 0, "closed form needs even df")
    val h = q / 2.0
    var fact = 1.0
    val terms = (0 until df / 2).map { j =>
      if (j > 0) fact *= j
      pow(h, j) / fact
    }
    exp(-h) * terms.reduce(_ + _)
  }

  /** Per-(group × feature) Q and p at max lag m over the melted panel.
    * Series with n ≤ m yield null (the reference's try/except → NaN). */
  def ljungBox(melted: DataFrame, m: Int = 10): DataFrame = {
    val wp = Window.partitionBy("group_key", "feature")
    val wo = Window.partitionBy("group_key", "feature").orderBy("date")
    val filtered = melted
      .filter(Panel.finite(col("value")))
      .withColumn("xc", col("value") - avg("value").over(wp))
    val withLags = (1 to m).foldLeft(filtered) { (df, k) =>
      df.withColumn(s"xl$k", lag(col("xc"), k).over(wo))
    }
    val aggCols = Seq(count(lit(1)).as("n"), sum(col("xc") * col("xc")).as("denom")) ++
      (1 to m).map(k => sum(col("xc") * col(s"xl$k")).as(s"num$k"))
    val aggd = withLags.groupBy("group_key", "feature").agg(aggCols.head, aggCols.tail: _*)
    val n = col("n").cast("double")
    val q = (1 to m)
      .map(k => pow(col(s"num$k") / col("denom"), 2) / (n - k))
      .reduce(_ + _) * n * (n + 2)
    aggd
      .withColumn("lb_q", when(col("n") > m, q))
      .withColumn("lb_p", when(col("n") > m, chi2SfEven(col("lb_q"), m)))
      .select("group_key", "feature", "n", "lb_q", "lb_p")
      .orderBy("feature", "group_key")
  }
}
