package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.core.Panel

/** K5 — periodogram dominant frequency (time_series_study.py:367-433).
  *
  * Replicates scipy.signal.periodogram defaults exactly: fs=1, boxcar
  * window, detrend='constant' (mean removal), one-sided density scaling
  * (|X_k|²/n, doubled except DC and — for even n — Nyquist). The caller's
  * optional linear detrend (`:390-393`) happens first. Direct O(n²) real
  * DFT: panel series are short, and this sidesteps power-of-2 padding
  * semantics; parallelism is across (group × feature) series.
  */
object Periodogram {

  /** (freqs, one-sided power density) of the mean-removed series. */
  def periodogram(x0: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x0.length
    val mean = x0.sum / n
    val x = x0.map(_ - mean)
    val m = n / 2 + 1
    val freqs = Array.tabulate(m)(k => k.toDouble / n)
    val power = new Array[Double](m)
    var k = 0
    while (k < m) {
      var re = 0.0
      var im = 0.0
      var t = 0
      while (t < n) {
        val ang = -2.0 * math.Pi * k * t / n
        re += x(t) * math.cos(ang)
        im += x(t) * math.sin(ang)
        t += 1
      }
      var p = (re * re + im * im) / n
      if (k != 0 && !(n % 2 == 0 && k == m - 1)) p *= 2.0
      power(k) = p
      k += 1
    }
    (freqs, power)
  }

  /** np.polyfit(deg=1) linear detrend (time_series_study.py:390-393). */
  def detrendLinear(x: Array[Double]): Array[Double] = {
    val n = x.length
    val tbar = (n - 1) / 2.0
    val xbar = x.sum / n
    var sxy = 0.0
    var sxx = 0.0
    var i = 0
    while (i < n) {
      sxy += (i - tbar) * (x(i) - xbar)
      sxx += (i - tbar) * (i - tbar)
      i += 1
    }
    val slope = sxy / sxx
    val intercept = xbar - slope * tbar
    Array.tabulate(n)(t => x(t) - (slope * t + intercept))
  }

  /** Dominant (freq, power), excluding DC when possible; first max wins
    * like np.argmax (time_series_study.py:401-403). */
  def dominant(x0: Array[Double], detrend: Boolean = true): (Double, Double) = {
    val x = if (detrend) detrendLinear(x0) else x0
    val (f, p) = periodogram(x)
    val start = if (f.length > 1) 1 else 0
    var idx = start
    var i = start + 1
    while (i < p.length) { if (p(i) > p(idx)) idx = i; i += 1 }
    (f(idx), p(idx))
  }

  case class FreqRow(group_key: String, feature: String, dom_freq: Double, dom_power: Double)

  /** Per-(group × feature) dominant frequency; series < minLen skipped
    * (time_series_study.py:388). */
  def frequencyDomain(melted: DataFrame, detrend: Boolean = true, minLen: Int = 8): DataFrame = {
    val ss = melted.sparkSession
    import ss.implicits._
    melted
      .filter(Panel.finite(col("value")))
      .select("group_key", "feature", "date", "value")
      .as[(String, String, java.sql.Timestamp, Double)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key: (String, String), it: Iterator[(String, String, java.sql.Timestamp, Double)]) =>
        val (g, f) = key
        val x = it.toArray.sortBy(r => (r._3.getTime, r._4)).map(_._4)
        if (x.length < minLen) Iterator.empty
        else {
          val (df0, dp) = dominant(x, detrend)
          Iterator.single(FreqRow(g, f, df0, dp))
        }
      }
      .toDF()
      .orderBy("feature", "group_key")
  }
}
