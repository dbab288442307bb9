package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Panel

/** K8 — plug-in mutual information from a 10×10 joint histogram
  * (time_series_study.py:554-568), fully relational:
  *
  *   MI = Σ_cells pxy · (ln(pxy + ε) − ln(px + ε) − ln(py + ε)),  ε = 1e-12
  *
  * np.histogram2d semantics: bins equal-width over [min, max] per axis,
  * right edge inclusive in the last bin ⇒ bin = least(floor((x−min)/w·B),
  * B−1); degenerate min==max ⇒ numpy range [v−0.5, v+0.5] puts everything
  * in bin B/2. Zero cells contribute exactly 0 (0·finite), so only
  * materialized cells matter — the histogram groupBy is the whole shuffle,
  * O(B²) rows per group afterwards. Scales to any series length.
  */
object MutualInfo {

  private val Eps = 1e-12

  private def binOf(x: Column, mn: Column, mx: Column, bins: Int): Column =
    when(mx === mn, lit(bins / 2))
      .otherwise(least(floor((x - mn) / (mx - mn) * bins), lit(bins - 1)))

  /** Per-group MI of two feature columns of a wide per-group frame.
    * Rows where either side is null/NaN are dropped first (the reference
    * aligns with an inner join + dropna, time_series_study.py:611-612).
    * Groups with fewer than `minN` aligned rows emit null (`:557-559`). */
  def mutualInfo(
      wide: DataFrame,
      groupCol: String,
      fa: String,
      fb: String,
      bins: Int = 10,
      minN: Int = 10): DataFrame = {
    val both = wide
      .filter(Panel.finite(col(fa)) && Panel.finite(col(fb)))
      .select(col(groupCol).as("group_key"), col(fa).as("x"), col(fb).as("y"))
    val wp = Window.partitionBy("group_key")
    // hoist the window aggregates into named columns: binOf references
    // its min 3× / max 2×, and inlining the window expression would make
    // the Window operator carry (and evaluate) each per-group extreme
    // several times (round-8 expression-duplication lint)
    val binned = both
      .withColumn("xmn", min("x").over(wp)).withColumn("xmx", max("x").over(wp))
      .withColumn("ymn", min("y").over(wp)).withColumn("ymx", max("y").over(wp))
      .withColumn("xbin", binOf(col("x"), col("xmn"), col("xmx"), bins))
      .withColumn("ybin", binOf(col("y"), col("ymn"), col("ymx"), bins))
      .drop("xmn", "xmx", "ymn", "ymx")
    val hist = binned.groupBy("group_key", "xbin", "ybin").agg(count(lit(1)).as("c"))
    val wg = Window.partitionBy("group_key")
    val wx = Window.partitionBy("group_key", "xbin")
    val wy = Window.partitionBy("group_key", "ybin")
    val terms = hist
      .withColumn("ntot", sum("c").over(wg))
      .withColumn("cx", sum("c").over(wx))
      .withColumn("cy", sum("c").over(wy))
      .withColumn(
        "term",
        (col("c") / col("ntot")) *
          (log(col("c") / col("ntot") + Eps)
            - log(col("cx") / col("ntot") + Eps)
            - log(col("cy") / col("ntot") + Eps)))
    terms
      .groupBy("group_key")
      .agg(sum("term").as("mi_raw"), first("ntot").as("n"))
      .select(
        col("group_key"),
        when(col("n") >= minN, col("mi_raw")).as("mi"))
      .orderBy("group_key")
  }
}
