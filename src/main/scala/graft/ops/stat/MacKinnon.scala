package graft.ops.stat

/** MacKinnon (1994, 2010) regression-surface approximate p-values for the
  * Dickey–Fuller tau distribution, as published in J.G. MacKinnon,
  * "Approximate Asymptotic Distribution Functions for Unit-Root and
  * Cointegration Tests" (JBES 1994) and the 2010 QED working paper update.
  * N is the number of series (1 = plain ADF, 2 = Engle–Granger on one
  * regressor's residuals, ...).
  *
  * p = Φ(poly(stat)) with a low-tail polynomial below τ* and a central
  * polynomial above; stat above τ_max → p = 1, below τ_min → p = 0.
  *
  * Constants for the "c" (constant) and "ct" (constant+trend) response
  * surfaces, N = 1..8, and the "n" (no deterministics) surface, N = 1.
  * The "c" table is validated against recorded reference outputs
  * (GoldenParitySpec); the "n" table against the classical no-constant DF
  * critical values (PropertySpec: τ=−1.94 → p≈0.05, τ=−2.57 → p≈0.01).
  */
object MacKinnon {

  private val tauStarC = Array(-1.61, -2.62, -3.13, -3.47, -3.78, -4.02, -4.18, -4.48)
  private val tauMinC = Array(-18.83, -18.86, -23.48, -28.07, -25.96, -23.27, -28.98, -25.73)
  private val tauMaxC = Array(2.74, 0.92, 0.55, 0.61, 0.79, 1.0, 1.16, 1.34)

  // ascending-power coefficients; small-p already scaled ([1, 1, 1e-2])
  private val tauCSmallP: Array[Array[Double]] = Array(
    Array(2.1659, 1.4412, 3.8269e-2),
    Array(2.92, 1.5012, 3.9796e-2),
    Array(3.4699, 1.4856, 3.164e-2),
    Array(3.9673, 1.4777, 2.6315e-2),
    Array(4.5509, 1.5338, 2.9545e-2),
    Array(5.1399, 1.6036, 3.4445e-2),
    Array(5.711, 1.6668, 3.8823e-2),
    Array(6.2421, 1.7339, 4.2731e-2))

  // large-p scaled by [1, 1e-1, 1e-1, 1e-2]
  private val tauCLargeP: Array[Array[Double]] = Array(
    Array(1.7339, 9.3202e-1, -1.2745e-1, -1.0368e-2),
    Array(2.1945, 6.4695e-1, -2.9198e-1, -4.2377e-2),
    Array(2.5893, 4.5168e-1, -3.6529e-1, -5.0074e-2),
    Array(3.0387, 4.5452e-1, -3.2327e-1, -4.2124e-2),
    Array(3.5049, 5.2098e-1, -2.9948e-1, -3.3468e-2),
    Array(3.9489, 5.8933e-1, -2.7279e-1, -2.4617e-2),
    Array(4.3708, 6.4278e-1, -2.4858e-1, -1.7814e-2),
    Array(4.7712, 6.8803e-1, -2.2997e-1, -1.2414e-2))

  // no-deterministics ("n"/"nc") surface — published for N = 1 only (a
  // residual-based test always includes the constant absorbed upstream)
  private val tauStarNc = -1.04
  private val tauMinNc = -19.04
  private val tauMaxNc = 2.74  // published upper clamp: p pinned to 1.0 above
  private val tauNcSmallP = Array(0.6344, 1.2378, 3.2496e-2)
  // large-p scaled by [1, 1e-1, 1e-1, 1e-2]
  private val tauNcLargeP = Array(0.4797, 9.3557e-1, -6.999e-2, 3.3066e-2)

  private val tauStarCt = Array(-2.89, -3.19, -3.5, -3.65, -3.8, -4.36, -4.36, -4.36)
  private val tauMinCt = Array(-16.18, -21.15, -25.37, -26.63, -26.53, -26.18, -27.17, -27.58)
  private val tauMaxCt = Array(0.7, 0.63, 0.71, 0.93, 1.19, 1.42, 1.61, 1.79)

  private val tauCtSmallP: Array[Array[Double]] = Array(
    Array(3.2657, 1.6696, 6.6748e-2),
    Array(3.6112, 1.5197, 5.3948e-2),
    Array(4.0327, 1.4946, 4.5314e-2),
    Array(4.4679, 1.4826, 4.4958e-2),
    Array(4.9026, 1.4956, 4.6774e-2),
    Array(5.333, 1.5306, 4.9529e-2),
    Array(5.759, 1.5824, 5.2751e-2),
    Array(6.1798, 1.6435, 5.6287e-2))

  private val tauCtLargeP: Array[Array[Double]] = Array(
    Array(2.7055, 4.3735e-1, -1.7689e-1, -1.8091e-2),
    Array(2.9738, 4.2703e-1, -3.2419e-1, -3.9895e-2),
    Array(3.2943, 4.1825e-1, -3.9436e-1, -5.0056e-2),
    Array(3.6585, 4.789e-1, -3.9266e-1, -4.8077e-2),
    Array(4.0113, 5.3967e-1, -3.7511e-1, -4.2925e-2),
    Array(4.3519, 5.9809e-1, -3.5561e-1, -3.7681e-2),
    Array(4.6849, 6.5291e-1, -3.3657e-1, -3.2817e-2),
    Array(5.0109, 7.0411e-1, -3.1831e-1, -2.8303e-2))

  /** Surface constants (τ*, τ_min, τ_max, small-p coeffs, large-p coeffs)
    * for oracle generation: the DuckDB replay SQL is built from the SAME
    * arrays the kernel evaluates, so the polynomial constants cannot drift
    * between engine and oracle. */
  def surface(regression: String, n: Int): (Double, Double, Double, Array[Double], Array[Double]) = {
    require(n >= 1 && n <= 8, s"N=$n outside tabulated range")
    require(regression != "n" || n == 1,
      "the no-constant surface is published for N=1 only")
    val i = n - 1
    regression match {
      case "n" => (tauStarNc, tauMinNc, tauMaxNc, tauNcSmallP, tauNcLargeP)
      case "ct" => (tauStarCt(i), tauMinCt(i), tauMaxCt(i), tauCtSmallP(i), tauCtLargeP(i))
      case _ => (tauStarC(i), tauMinC(i), tauMaxC(i), tauCSmallP(i), tauCLargeP(i))
    }
  }

  /** Approximate p-value for tau `stat`. regression ∈ {"n","c","ct"}.
    *
    * "n" (no deterministic terms) uses the published no-constant surface,
    * which is tabulated for N = 1 only — the one case it is defined for
    * (a residual-based test of N ≥ 2 series absorbs a constant upstream).
    * Mid-range sanity anchor: stat = −1.5 → p ≈ 0.125 (the "c" surface
    * would wrongly say ~0.53 there). */
  def p(stat: Double, regression: String, n: Int): Double = {
    val (star, mn, mx, small, large) = surface(regression, n)
    if (stat > mx) 1.0
    else if (stat < mn) 0.0
    else {
      val coeffs = if (stat <= star) small else large
      Stats.normCdf(Stats.polyvalAsc(coeffs, stat))
    }
  }
}
