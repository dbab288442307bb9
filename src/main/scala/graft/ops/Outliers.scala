package graft.ops

import scala.util.Random
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.core.Panel

/** K11 — per-(group × feature) outlier detection
  * (time_series_study.py:881-977): three methods with sklearn-style label
  * semantics (−1 outlier / 1 inlier) and a contamination-quantile cut.
  *
  * Exact sklearn score parity is a declared non-goal (SURVEY §2.9): the
  * contract is the published algorithms — Liu et al. 2008 isolation forest,
  * Breunig et al. 2000 LOF — with deterministic seeding, label semantics,
  * and the 10% contamination cut, verified by property tests. The z-score
  * method is exact (population σ, |z| > 3).
  */
object Outliers {

  // ---- isolation forest (1-D, Liu et al. 2008) ----------------------------

  private def cFactor(n: Int): Double =
    if (n <= 1) 0.0
    else 2.0 * (math.log(n - 1.0) + 0.5772156649015329) - 2.0 * (n - 1.0) / n

  /** Average isolation path length per point over `nTrees` random trees. */
  private def iforestDepths(x: Array[Double], rng: Random, nTrees: Int, subsample: Int): Array[Double] = {
    val n = x.length
    val psi = math.min(subsample, n)
    val hlim = math.ceil(math.log(psi.toDouble) / math.log(2.0)).toInt
    val depths = new Array[Double](n)

    // one random tree on a subsample; returns a scorer via recursive closure
    def buildScore(idx: Array[Int], depth: Int): Double => Double = {
      if (idx.length <= 1 || depth >= hlim) {
        val adj = depth + cFactor(idx.length)
        _ => adj
      } else {
        var mn = Double.PositiveInfinity
        var mx = Double.NegativeInfinity
        idx.foreach { i => val v = x(i); if (v < mn) mn = v; if (v > mx) mx = v }
        if (mn == mx) { val adj = depth + cFactor(idx.length); _ => adj }
        else {
          val split = mn + rng.nextDouble() * (mx - mn)
          val left = idx.filter(x(_) < split)
          val right = idx.filter(x(_) >= split)
          val ls = buildScore(left, depth + 1)
          val rs = buildScore(right, depth + 1)
          v => if (v < split) ls(v) else rs(v)
        }
      }
    }

    // subsample WITHOUT replacement (Liu et al. 2008): partial
    // Fisher-Yates of the index range, first psi entries
    val idxPool = Array.tabulate(n)(identity)
    var t = 0
    while (t < nTrees) {
      var s = 0
      while (s < psi) {
        val j = s + rng.nextInt(n - s)
        val tmp = idxPool(s); idxPool(s) = idxPool(j); idxPool(j) = tmp
        s += 1
      }
      val sample = java.util.Arrays.copyOfRange(idxPool, 0, psi)
      val scorer = buildScore(sample, 0)
      var i = 0
      while (i < n) { depths(i) += scorer(x(i)); i += 1 }
      t += 1
    }
    depths.map(_ / nTrees)
  }

  /** (labels ∈ {−1,1}, scores) — higher score = more anomalous is inverted
    * to sklearn's convention where LOWER decision value = more anomalous. */
  def isolationForest(
      x: Array[Double],
      contamination: Double = 0.1,
      nTrees: Int = 100,
      subsample: Int = 256,
      seed: Long = 42L): (Array[Int], Array[Double]) = {
    val n = x.length
    val psi = math.min(subsample, n)
    val depths = iforestDepths(x, new Random(seed), nTrees, psi)
    // score_samples = -2^(-E[h]/c(psi)); decision = score_samples - offset
    val scoreSamples = depths.map(d => -math.pow(2.0, -d / cFactor(psi)))
    val offset = quantile(scoreSamples, contamination)
    val decision = scoreSamples.map(_ - offset)
    (decision.map(d => if (d < 0) -1 else 1), decision)
  }

  // ---- local outlier factor (1-D, Breunig et al. 2000) --------------------

  /** (labels, negative_outlier_factor). Neighborhoods include distance ties
    * like sklearn; lrd is guarded with 1e-10 for duplicate-heavy data. */
  def localOutlierFactor(
      x: Array[Double],
      nNeighbors: Int,
      contamination: Double = 0.1): (Array[Int], Array[Double]) = {
    val n = x.length
    val k = math.max(1, math.min(nNeighbors, n - 1))
    val order = x.zipWithIndex.sortBy(_._1)
    val sorted = order.map(_._1)
    // k-distance + neighbor list (with ties) per point via sorted expansion
    val kdist = new Array[Double](n)
    val neighbors = new Array[Array[Int]](n)
    var p = 0
    while (p < n) {
      var lo = p
      var hi = p
      var taken = 0
      while (taken < k && (lo > 0 || hi < n - 1)) {
        val dl = if (lo > 0) sorted(p) - sorted(lo - 1) else Double.PositiveInfinity
        val dr = if (hi < n - 1) sorted(hi + 1) - sorted(p) else Double.PositiveInfinity
        if (dl <= dr) { lo -= 1 } else { hi += 1 }
        taken += 1
      }
      val kd = math.max(sorted(p) - sorted(lo), sorted(hi) - sorted(p))
      // include all distance ties
      while (lo > 0 && sorted(p) - sorted(lo - 1) <= kd) lo -= 1
      while (hi < n - 1 && sorted(hi + 1) - sorted(p) <= kd) hi += 1
      kdist(p) = kd
      neighbors(p) = ((lo until p) ++ (p + 1 to hi)).toArray
      p += 1
    }
    val lrd = new Array[Double](n)
    p = 0
    while (p < n) {
      var s = 0.0
      neighbors(p).foreach { o =>
        s += math.max(kdist(o), math.abs(sorted(p) - sorted(o)))
      }
      lrd(p) = 1.0 / (s / neighbors(p).length + 1e-10)
      p += 1
    }
    val lofSorted = new Array[Double](n)
    p = 0
    while (p < n) {
      var s = 0.0
      neighbors(p).foreach(o => s += lrd(o))
      lofSorted(p) = s / neighbors(p).length / lrd(p)
      p += 1
    }
    // back to original index order; negative_outlier_factor_ = -LOF
    val nof = new Array[Double](n)
    p = 0
    while (p < n) { nof(order(p)._2) = -lofSorted(p); p += 1 }
    val threshold = quantile(nof, contamination)
    (nof.map(v => if (v < threshold) -1 else 1), nof)
  }

  // ---- z-score (exact, time_series_study.py:932-936) ----------------------

  def zscore(x: Array[Double]): (Array[Int], Array[Double]) = {
    val n = x.length
    val mu = x.sum / n
    val sigma = math.sqrt(x.map(v => (v - mu) * (v - mu)).sum / n)
    val z = x.map(v => math.abs((v - mu) / sigma))
    (z.map(v => if (v > 3) -1 else 1), z)
  }

  /** linear-interpolation percentile (np.percentile default) */
  private def quantile(a: Array[Double], q: Double): Double = {
    val s = a.sorted
    val pos = q * (s.length - 1)
    val i = pos.toInt
    if (i >= s.length - 1) s.last
    else s(i) + (pos - i) * (s(i + 1) - s(i))
  }

  case class OutlierRow(
      group_key: String, feature: String, method: String, n: Long,
      n_outliers: Long, outlier_rate: Double, avg_outlier_score: Double,
      max_outlier_score: Double, min_outlier_score: Double)

  /** Per-(group × feature) outlier summary (`:941-954`): one row per series
    * with ≥ minLen finite points; avg score over outliers (0.0 when none),
    * max/min over all scores. Deterministic: the iforest seed derives from
    * (group, feature). */
  def outlierSummary(
      melted: DataFrame,
      method: String = "isolation_forest",
      contamination: Double = 0.1,
      minLen: Int = 10): DataFrame = {
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
          val (labels, scores) = method match {
            case "isolation_forest" =>
              isolationForest(x, contamination, seed = (g + "|" + f).hashCode.toLong ^ 42L)
            case "local_outlier_factor" =>
              localOutlierFactor(x, math.min(20, x.length / 2), contamination)
            case "zscore" => zscore(x)
            case m => throw new IllegalArgumentException(s"Unknown method: $m")
          }
          val out = labels.zip(scores).filter(_._1 == -1).map(_._2)
          Iterator.single(OutlierRow(
            g, f, method, x.length, out.length, out.length.toDouble / x.length,
            if (out.nonEmpty) out.sum / out.length else 0.0,
            scores.max, scores.min))
        }
      }
      .toDF()
      .orderBy("feature", "group_key")
  }
}
