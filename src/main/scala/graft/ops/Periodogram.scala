package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.core.Panel

/** K5 — periodogram dominant frequency (time_series_study.py:367-433).
  *
  * Replicates scipy.signal.periodogram defaults exactly: fs=1, boxcar
  * window, detrend='constant' (mean removal), one-sided density scaling
  * (|X_k|²/n, doubled except DC and — for even n — Nyquist). The caller's
  * optional linear detrend (`:390-393`) happens first.
  *
  * Transform dispatch: series up to `directDftThreshold` use a direct
  * O(n²) real DFT (exact scipy-default semantics with no power-of-2
  * padding games — and the form the SQL oracles mirror term-for-term);
  * longer series switch to an O(n log n) Bluestein chirp-z FFT (exact
  * arbitrary-n DFT, no padding of the SERIES itself — only the internal
  * convolution is padded), so a 100×-longer series costs 100·log instead
  * of going quadratic. Agreement between the two paths is pinned to
  * ~1e-9 relative in PropertySpec. Parallelism is across
  * (group × feature) series either way.
  */
object Periodogram {

  /** Above this length the O(n²) direct DFT hands off to the Bluestein
    * FFT (~16M inner-loop ops at the boundary — past it the quadratic
    * cost would dominate a 32-core stage). */
  private[graft] val directDftThreshold = 4096

  /** (freqs, one-sided power density) of the mean-removed series. */
  def periodogram(x0: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x0.length
    val mean = x0.sum / n
    val x = x0.map(_ - mean)
    val m = n / 2 + 1
    val freqs = Array.tabulate(m)(k => k.toDouble / n)
    val power =
      if (n <= directDftThreshold) directPower(x)
      else {
        val (re, im) = dftBluestein(x)
        val p = new Array[Double](m)
        var k = 0
        while (k < m) {
          var pk = (re(k) * re(k) + im(k) * im(k)) / n
          if (k != 0 && !(n % 2 == 0 && k == m - 1)) pk *= 2.0
          p(k) = pk
          k += 1
        }
        p
      }
    (freqs, power)
  }

  /** Direct O(n²) one-sided power of an already-centered series. */
  private[graft] def directPower(x: Array[Double]): Array[Double] = {
    val n = x.length
    val m = n / 2 + 1
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
    power
  }

  /** In-place iterative radix-2 complex FFT; `re.length` must be a power
    * of two. Twiddles are computed per butterfly from the angle (no
    * multiplicative recurrence) so rounding error stays O(eps·log n). */
  private def fftRadix2(re: Array[Double], im: Array[Double], invert: Boolean): Unit = {
    val n = re.length
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val base = (if (invert) 2.0 else -2.0) * math.Pi / len
      val half = len >> 1
      var blk = 0
      while (blk < n) {
        var k = 0
        while (k < half) {
          val ang = base * k
          val cr = math.cos(ang)
          val ci = math.sin(ang)
          val ur = re(blk + k); val ui = im(blk + k)
          val xr = re(blk + k + half); val xi = im(blk + k + half)
          val vr = xr * cr - xi * ci
          val vi = xr * ci + xi * cr
          re(blk + k) = ur + vr; im(blk + k) = ui + vi
          re(blk + k + half) = ur - vr; im(blk + k + half) = ui - vi
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
    if (invert) {
      var t = 0
      while (t < n) { re(t) /= n; im(t) /= n; t += 1 }
    }
  }

  /** Bluestein chirp-z: the exact length-n DFT of a real series for ANY n
    * (prime lengths included) in O(n log n), via one circular convolution
    * at the next power of two ≥ 2n−1. Chirp phases use j² mod 2n in Long
    * arithmetic so large n neither overflows nor loses precision to a
    * huge trig argument. Returns (Re X_k, Im X_k), k = 0..n−1. */
  private[graft] def dftBluestein(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    var m = 1
    while (m < 2 * n - 1) m <<= 1
    val are = new Array[Double](m); val aim = new Array[Double](m)
    val bre = new Array[Double](m); val bim = new Array[Double](m)
    val n2 = 2L * n
    var j = 0
    while (j < n) {
      val q = (j.toLong * j) % n2
      val ang = math.Pi * q / n
      val cr = math.cos(ang)
      val ci = -math.sin(ang) // c_j = e^{-iπj²/n}
      are(j) = x(j) * cr; aim(j) = x(j) * ci
      bre(j) = cr; bim(j) = -ci // b_j = conj(c_j), wrapped circularly
      if (j != 0) { bre(m - j) = bre(j); bim(m - j) = bim(j) }
      j += 1
    }
    fftRadix2(are, aim, invert = false)
    fftRadix2(bre, bim, invert = false)
    var t = 0
    while (t < m) {
      val rr = are(t) * bre(t) - aim(t) * bim(t)
      val ii = are(t) * bim(t) + aim(t) * bre(t)
      are(t) = rr; aim(t) = ii
      t += 1
    }
    fftRadix2(are, aim, invert = true)
    val outRe = new Array[Double](n); val outIm = new Array[Double](n)
    var k = 0
    while (k < n) {
      val q = (k.toLong * k) % n2
      val ang = math.Pi * q / n
      val cr = math.cos(ang)
      val ci = -math.sin(ang)
      outRe(k) = are(k) * cr - aim(k) * ci
      outIm(k) = are(k) * ci + aim(k) * cr
      k += 1
    }
    (outRe, outIm)
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
    // Shuffle geometry (r15 stage audit): the old groupByKey exchange was
    // byte-sized by AQE, which coalesced a ~600 KB panel to ONE partition
    // and serialized every series' O(n²) DFT into a single task — compute
    // per byte is enormous here and invisible to byte-based coalescing.
    // An explicit fixed-N hash repartition on the series key (N = the
    // session's configured shuffle parallelism, the standard scale knob)
    // is exempt from AQE coalescing, so series spread across tasks; the
    // in-partition sort makes groups contiguous in exactly the per-group
    // (time, value) order the old sortBy used. The result (one row per
    // series) is pinned before the orderBy: a range sort samples its
    // child, and an unpinned child re-executed every DFT a second time.
    val parts = ss.sessionState.conf.numShufflePartitions
    val rows = melted
      .filter(Panel.finite(col("value")))
      .select("group_key", "feature", "date", "value")
      .repartition(parts, col("group_key"), col("feature"))
      .sortWithinPartitions("group_key", "feature", "date", "value")
      .as[(String, String, java.sql.Timestamp, Double)]
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[FreqRow]
        var key: (String, String) = null
        val buf = scala.collection.mutable.ArrayBuffer.empty[Double]
        def flush(): Unit = if (key != null && buf.length >= minLen) {
          val (df0, dp) = dominant(buf.toArray, detrend)
          out += FreqRow(key._1, key._2, df0, dp)
        }
        it.foreach { r =>
          val k = (r._1, r._2)
          if (k != key) { flush(); key = k; buf.clear() }
          buf += r._4
        }
        flush()
        out.iterator
      }
      .toDF()
    graft.core.Ckpt.pin(rows).orderBy("feature", "group_key")
  }
}
