package graft

import java.sql.Timestamp
import graft.core.Panel
import graft.ops.{Detrend, Hurst, Lags, MutualInfo}

class LagsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) = new Timestamp(86400000L * day)

  /** Melted single-feature panel from (day, value) pairs. */
  private def panel(vals: Seq[Double], group: String = "G1") =
    vals.zipWithIndex
      .map { case (v, i) => (ts(i), group, "f", v) }
      .toDF("date", "group_key", "feature", "value")

  test("acf lag1 of a linear ramp is 1.0") {
    val m = panel((1 to 30).map(_.toDouble))
    val r = Lags.acf(m, Seq(1, 5)).head()
    assert(math.abs(r.getAs[Double]("acf_lag1") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("acf_lag5") - 1.0) < 1e-9)
  }

  test("acf drops series shorter than minLen") {
    val m = panel((1 to 5).map(_.toDouble))
    assert(Lags.acf(m, Seq(1)).count() == 0)
  }

  test("ar1 r2 of a deterministic linear series is 1.0") {
    val m = panel((1 to 30).map(_.toDouble))
    val r = Lags.ar1(m).head()
    assert(math.abs(r.getAs[Double]("ar1_r2") - 1.0) < 1e-9)
  }

  test("ar1 r2 is 0.0 when the lagged regressor is constant but y varies") {
    // y = [c, c, ..., c, d]: all lagged values equal c, responses vary —
    // numpy's min-norm lstsq path yields yhat = mean(y) => R^2 = 0.0
    val m = panel(Seq.fill(14)(5.0) :+ 9.0)
    val r = Lags.ar1(m).head()
    assert(r.getAs[Double]("ar1_r2") == 0.0)
    // fully constant series: ss_tot = 0 => null (reference NaN)
    val r2 = Lags.ar1(panel(Seq.fill(15)(5.0))).head()
    assert(r2.isNullAt(r2.fieldIndex("ar1_r2")))
  }

  test("ar1 requires 10 finite pairs") {
    val m = panel((1 to 10).map(_.toDouble)) // 9 pairs only
    assert(Lags.ar1(m).count() == 0)
  }

  test("hurst of constant series with n>=20 is 0.5; short series null") {
    val r = Hurst.hurst(panel(Seq.fill(25)(7.0))).head()
    assert(r.getAs[Double]("hurst_exp") == 0.5)
    val r2 = Hurst.hurst(panel(Seq.fill(19)(7.0))).head()
    assert(r2.isNullAt(r2.fieldIndex("hurst_exp")))
  }

  test("hurst matches the reference formula on a known series") {
    // x = 0..24: cumsum(x - 12) range / std(ddof=1); H = ln(r/s)/ln(25)
    val x = (0 until 25).map(_.toDouble)
    val mu = x.sum / x.length
    val cs = x.scanLeft(0.0)(_ + _ - mu).tail
    val r = cs.max - cs.min
    val s = math.sqrt(x.map(v => (v - mu) * (v - mu)).sum / (x.length - 1))
    val want = math.log(r / s) / math.log(x.length)
    val got = Hurst.hurst(panel(x)).head().getAs[Double]("hurst_exp")
    assert(math.abs(got - want) < 1e-9)
  }

  test("trendFit recovers slope/intercept of an exact line") {
    val m = panel((0 until 30).map(t => 2.0 * t + 3.0))
    val r = Detrend.trendFit(m).head()
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - 3.0) < 1e-9)
    val d = Detrend.detrended(m)
    assert(d.select(org.apache.spark.sql.functions.max(
      org.apache.spark.sql.functions.abs($"detrended"))).head().getDouble(0) < 1e-9)
  }

  test("mutual information of identical uniform series is ln(10)") {
    // x = y = 0..29 → every 10-bin cell on the diagonal holds 3 values:
    // pxy = 0.1, px = py = 0.1 → MI = -ln(0.1) = ln(10)  (within eps smoothing)
    val df = (0 until 30).map(i => ("G1", i.toDouble, i.toDouble)).toDF("g", "x", "y")
    val r = MutualInfo.mutualInfo(df, "g", "x", "y").head()
    assert(math.abs(r.getAs[Double]("mi") - math.log(10.0)) < 1e-6)
  }

  test("mutual information null under minN") {
    val df = (0 until 5).map(i => ("G1", i.toDouble, i.toDouble)).toDF("g", "x", "y")
    val r = MutualInfo.mutualInfo(df, "g", "x", "y").head()
    assert(r.isNullAt(r.fieldIndex("mi")))
  }

  test("rolling corr null until window full, 1.0 for perfectly correlated") {
    val df = (0 until 15)
      .map(i => (ts(i), "G1", i.toDouble, 2.0 * i + 1.0))
      .toDF("date", "g", "a", "b")
    val r = Lags.rollingCorr(df, "date", "g", "a", "b", 10)
      .orderBy("date").collect()
    assert(r.take(9).forall(_.isNullAt(2)))
    assert(r.drop(9).forall(row => math.abs(row.getDouble(2) - 1.0) < 1e-9))
  }

  test("pctChange: fractional steps, null on series start and zero prev") {
    val out = Lags.pctChange(panel(Seq(100.0, 110.0, 99.0, 0.0, 5.0)))
      .orderBy("date").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("pct_change")))
    assert(math.abs(out(1).getAs[Double]("pct_change") - 0.1) < 1e-12)
    assert(math.abs(out(2).getAs[Double]("pct_change") + 0.1) < 1e-12)
    assert(out(3).getAs[Double]("pct_change") == -1.0)  // 0/99 - 1
    assert(out(4).isNullAt(out(4).fieldIndex("pct_change")))  // prev = 0
    // series are independent: a second group restarts at null
    val two = Lags.pctChange(panel(Seq(1.0, 2.0)).unionByName(
      panel(Seq(8.0, 4.0), group = "G2"))).orderBy("group_key", "date").collect()
    assert(two(2).isNullAt(two(2).fieldIndex("pct_change")))
    assert(two(3).getAs[Double]("pct_change") == -0.5)
  }

  test("lagged cross corr: identical features give avg_corr 1 at lag 0") {
    val df = (0 until 40)
      .map(i => (ts(i), "G1", math.sin(i * 0.7) * 5 + i, math.sin(i * 0.7) * 5 + i))
      .toDF("date", "g", "fa", "fb")
    val r = Lags.laggedCrossCorr(df, "date", "g", Seq(("fa", "fb")), maxLag = 2)
      .orderBy("lag").collect()
    assert(r.length == 3)
    assert(math.abs(r(0).getAs[Double]("avg_corr") - 1.0) < 1e-9)
  }
}
