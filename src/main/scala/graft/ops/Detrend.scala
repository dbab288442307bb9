package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Panel

/** F7 — closed-form degree-1 linear detrend (np.polyfit deg=1 then subtract,
  * time_series_study.py:390-393), applied per (group × feature) to the
  * finite-compacted series with t = 0..n−1 over date order.
  *
  * slope = covar_pop(t, x) / var_pop(t); intercept = x̄ − slope·t̄ — exact
  * OLS closed form, pure aggregates, no kernel.
  */
object Detrend {

  /** Per-(group × feature) fitted trend coefficients. */
  def trendFit(melted: DataFrame): DataFrame = {
    val w = Window.partitionBy("group_key", "feature").orderBy("date")
    val withT = melted
      .filter(Panel.finite(col("value")))
      .withColumn("t", (row_number().over(w) - 1).cast("double"))
    withT
      .groupBy("group_key", "feature")
      .agg(
        count(lit(1)).as("n"),
        (covar_pop(col("t"), col("value")) / var_pop(col("t"))).as("slope"),
        (avg("value") - covar_pop(col("t"), col("value")) / var_pop(col("t")) * avg("t"))
          .as("intercept"))
  }

  /** Melted panel + `detrended` column (x − (slope·t + intercept)). Uses
    * partition-only windows so the trend join never leaves the executor. */
  def detrended(melted: DataFrame): DataFrame = {
    val wo = Window.partitionBy("group_key", "feature").orderBy("date")
    val wp = Window.partitionBy("group_key", "feature")
    val withT = melted
      .filter(Panel.finite(col("value")))
      .withColumn("t", (row_number().over(wo) - 1).cast("double"))
    val slope = covar_pop(col("t"), col("value")).over(wp) / var_pop(col("t")).over(wp)
    val intercept = avg("value").over(wp) - slope * avg("t").over(wp)
    withT.withColumn("detrended", col("value") - (slope * col("t") + intercept))
  }
}
