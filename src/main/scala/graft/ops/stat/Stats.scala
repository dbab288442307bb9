package graft.ops.stat

import breeze.linalg.{inv, DenseMatrix, DenseVector}
import org.apache.commons.math3.special.{Erf, Gamma}

/** OLS fit result. `llf`/`aic` follow the classical Gaussian-MLE OLS forms
  * used by standard econometrics packages:
  *   llf = −n/2·(ln 2π + ln(ssr/n) + 1),  aic = −2·llf + 2k.
  */
final case class OlsFit(
    beta: DenseVector[Double],
    resid: DenseVector[Double],
    ssr: Double,
    nobs: Int,
    k: Int,
    xtxInv: DenseMatrix[Double]) {
  def sigma2: Double = ssr / (nobs - k)
  def llf: Double = -0.5 * nobs * (math.log(2 * math.Pi) + math.log(ssr / nobs) + 1.0)
  def aic: Double = -2.0 * llf + 2.0 * k
  /** t statistic of coefficient j. */
  def tstat(j: Int): Double = beta(j) / math.sqrt(sigma2 * xtxInv(j, j))
}

/** Small-series numerics shared by the statistical kernels. Series are
  * panel-small by design (the parallelism is across groups), so dense local
  * linear algebra is the right tool; nothing here touches Spark.
  */
object Stats {

  /** OLS of y on the given column vectors (no implicit intercept). */
  def ols(y: Array[Double], cols: Array[Array[Double]]): OlsFit = {
    val n = y.length
    val k = cols.length
    require(cols.forall(_.length == n), "ragged design matrix")
    val x = DenseMatrix.zeros[Double](n, k)
    var j = 0
    while (j < k) { var i = 0; while (i < n) { x(i, j) = cols(j)(i); i += 1 }; j += 1 }
    val yv = DenseVector(y)
    val xtx = x.t * x
    val xtxInv = inv(xtx)
    val beta = xtxInv * (x.t * yv)
    val resid = yv - x * beta
    val ssr = resid dot resid
    OlsFit(beta, resid, ssr, n, k, xtxInv)
  }

  def ones(n: Int): Array[Double] = Array.fill(n)(1.0)

  /** χ² survival function (1 − CDF) via the regularized upper incomplete
    * gamma — keeps precision in the far tail where 1−cdf would cancel. */
  def chi2Sf(x: Double, df: Double): Double =
    if (x <= 0) 1.0 else Gamma.regularizedGammaQ(df / 2.0, x / 2.0)

  /** Standard normal CDF via erfc (tail-accurate). */
  def normCdf(x: Double): Double = 0.5 * Erf.erfc(-x / math.sqrt(2.0))

  /** Σ c(i)·x^i (ascending coefficient order). */
  def polyvalAsc(c: Array[Double], x: Double): Double = {
    var acc = 0.0
    var i = c.length - 1
    while (i >= 0) { acc = acc * x + c(i); i -= 1 }
    acc
  }

  def dot(a: Array[Double], b: Array[Double], n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** np.interp semantics: xp ascending, linear inside, clamped outside. */
  def interp(x: Double, xp: Array[Double], fp: Array[Double]): Double = {
    if (x <= xp.head) return fp.head
    if (x >= xp.last) return fp.last
    var i = 1
    while (xp(i) < x) i += 1
    fp(i - 1) + (fp(i) - fp(i - 1)) * (x - xp(i - 1)) / (xp(i) - xp(i - 1))
  }
}
