package graft.ops

import breeze.linalg.DenseVector
import breeze.optimize.{ApproximateGradientFunction, LBFGS}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.core.Panel

/** K10 — GARCH(1,1) volatility analysis (time_series_study.py:780-879):
  * constant-mean Gaussian GARCH as in the reference's arch_model defaults:
  *
  *   y_t = μ + ε_t,   σ²_t = ω + α·ε²_{t−1} + β·σ²_{t−1},  ε_t ~ N(0, σ²_t)
  *
  * MLE over (μ, ω, α, β) via L-BFGS on transformed parameters (ω = e^w;
  * α, β through a softmax-style map that enforces α, β ≥ 0 and
  * α + β < 1). σ²_0 is the EWMA backcast (λ = 0.94, first ≤ 75 squared
  * residuals), the arch package's convention. The reference's recorded
  * GARCH run produced an empty table (SURVEY §2.9 Q4 — every per-group fit
  * failed on non-return panel data), so numerical parity is validated by
  * property tests on synthetic series with known (ω, α, β) instead of
  * golden files.
  *
  * Output metrics mirror the reference row: llf, aic, bic (k = 4),
  * conditional-volatility mean/std/skew/kurt (pandas-corrected moments),
  * persistence = α + β (the reference string-matches 'alpha'/'beta'
  * param names, `:838-842`).
  */
object Garch {

  final case class GarchFit(
      mu: Double, omega: Double, alpha: Double, beta: Double,
      llf: Double, condVol: Array[Double])

  private def backcast(e2: Array[Double]): Double = {
    val m = math.min(75, e2.length)
    val lam = 0.94
    var wsum = 0.0
    var s = 0.0
    var i = 0
    while (i < m) { val w = math.pow(lam, i); wsum += w; s += w * e2(i); i += 1 }
    s / wsum
  }

  /** Negative log-likelihood of the transformed parameter vector. */
  private def nll(y: Array[Double])(theta: DenseVector[Double]): Double = {
    val n = y.length
    val mu = theta(0)
    val omega = math.exp(theta(1))
    val ea = math.exp(theta(2))
    val eb = math.exp(theta(3))
    val denom = 1.0 + ea + eb
    val alpha = ea / denom
    val beta = eb / denom
    val e2 = y.map(v => (v - mu) * (v - mu))
    var s2 = backcast(e2)
    var ll = 0.0
    var t = 0
    while (t < n) {
      if (t > 0) s2 = omega + alpha * e2(t - 1) + beta * s2
      if (s2 <= 0 || s2.isNaN) return 1e12
      ll += -0.5 * (math.log(2.0 * math.Pi) + math.log(s2) + e2(t) / s2)
      t += 1
    }
    if (ll.isNaN) 1e12 else -ll
  }

  def fitGarch11(y: Array[Double]): GarchFit = {
    val n = y.length
    val mean = y.sum / n
    val variance = y.map(v => (v - mean) * (v - mean)).sum / n
    val a0 = 0.05
    val b0 = 0.85
    // invert the softmax-style transform for the start point
    val start = DenseVector(
      mean,
      math.log(math.max(variance * (1.0 - a0 - b0), 1e-12)),
      math.log(a0 / (1.0 - a0 - b0)),
      math.log(b0 / (1.0 - a0 - b0)))
    val f = new ApproximateGradientFunction[Int, DenseVector[Double]](nll(y))
    val lbfgs = new LBFGS[DenseVector[Double]](maxIter = 500, m = 7, tolerance = 1e-9)
    val opt = lbfgs.minimize(f, start)
    val mu = opt(0)
    val omega = math.exp(opt(1))
    val ea = math.exp(opt(2))
    val eb = math.exp(opt(3))
    val denom = 1.0 + ea + eb
    val alpha = ea / denom
    val beta = eb / denom
    // conditional volatility path at the optimum
    val e2 = y.map(v => (v - mu) * (v - mu))
    val vol = new Array[Double](n)
    var s2 = backcast(e2)
    var t = 0
    while (t < n) {
      if (t > 0) s2 = omega + alpha * e2(t - 1) + beta * s2
      vol(t) = math.sqrt(s2)
      t += 1
    }
    GarchFit(mu, omega, alpha, beta, -nll(y)(opt), vol)
  }

  case class VolRow(
      group_key: String, feature: String, model_type: String,
      log_likelihood: Option[Double], aic: Option[Double], bic: Option[Double],
      avg_volatility: Option[Double], vol_std: Option[Double],
      vol_skew: Option[Double], vol_kurt: Option[Double],
      persistence: Option[Double])

  /** Pandas-parity sample moments of a local array (G1/G2 corrections). */
  private def sampleMoments(x: Array[Double]): (Double, Double, Double, Double) = {
    val n = x.length.toDouble
    val mean = x.sum / n
    val m2 = x.map(v => (v - mean) * (v - mean)).sum / n
    val m3 = x.map(v => math.pow(v - mean, 3)).sum / n
    val m4 = x.map(v => math.pow(v - mean, 4)).sum / n
    val std = math.sqrt(m2 * n / (n - 1))
    val g1 = m3 / math.pow(m2, 1.5)
    val g2 = m4 / (m2 * m2) - 3.0
    val skew = g1 * math.sqrt(n * (n - 1)) / (n - 2)
    val kurt = (n - 1) / ((n - 2) * (n - 3)) * ((n + 1) * g2 + 6.0)
    (mean, std, skew, kurt)
  }

  /** Per-(group × feature) GARCH(1,1) summary; series < minLen skipped
    * (`:818-820`); failed fits emit null metrics. */
  def volatilityAnalysis(melted: DataFrame, minLen: Int = 50): DataFrame = {
    val ss = melted.sparkSession
    import ss.implicits._
    melted
      .filter(Panel.finite(col("value")))
      .select("group_key", "feature", "date", "value")
      .as[(String, String, java.sql.Timestamp, Double)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key: (String, String), it: Iterator[(String, String, java.sql.Timestamp, Double)]) =>
        val (g, f) = key
        val y = it.toArray.sortBy(_._3.getTime).map(_._4)
        if (y.length < minLen) Iterator.empty
        else {
          try {
            val ft = fitGarch11(y)
            val n = y.length
            val k = 4
            val (vm, vs, vsk, vk) = sampleMoments(ft.condVol)
            Iterator.single(VolRow(g, f, "GARCH",
              Some(ft.llf), Some(2.0 * k - 2.0 * ft.llf),
              Some(math.log(n.toDouble) * k - 2.0 * ft.llf),
              Some(vm), Some(vs), Some(vsk), Some(vk),
              Some(ft.alpha + ft.beta)))
          } catch {
            case _: Throwable =>
              Iterator.single(VolRow(g, f, "GARCH", None, None, None, None, None, None, None, None))
          }
        }
      }
      .toDF()
      .orderBy("feature", "group_key")
  }
}
