package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Panel

/** K3 — simplified single-window rescaled-range Hurst exponent
  * (time_series_study.py:303-315):
  *
  *   H = ln( (max − min of cumsum(x − x̄)) / std(x, ddof=1) ) / ln(n)
  *
  * n < 20 → null (pandas NaN); σ = 0 → 0.5. Pure window/agg pipeline —
  * one shuffle on (group_key, feature), one sort, no kernel, no
  * collect_list; the running sum is a streaming window frame so memory per
  * series is O(1) regardless of series length.
  */
object Hurst {

  def hurst(melted: DataFrame): DataFrame = {
    val wp = Window.partitionBy("group_key", "feature")
    val wo = wp.orderBy("date").rowsBetween(Window.unboundedPreceding, 0)
    val withCs = melted
      .filter(Panel.finite(col("value")))
      .withColumn("mu", avg("value").over(wp))
      .withColumn("cs", sum(col("value") - col("mu")).over(wo))
    withCs
      .groupBy("group_key", "feature")
      .agg(
        count(lit(1)).as("n"),
        stddev_samp("value").as("sigma"),
        (max("cs") - min("cs")).as("rng"))
      .withColumn(
        "hurst_exp",
        when(col("n") < 20, lit(null))
          .when(col("sigma") === 0, lit(0.5))
          .otherwise(log(col("rng") / col("sigma")) / log(col("n"))))
      .select("group_key", "feature", "n", "hurst_exp")
  }
}
