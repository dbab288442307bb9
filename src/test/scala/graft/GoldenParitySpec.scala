package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Panel
import graft.ops._

/** Golden-parity tests: the engine's operators versus the reference's
  * recorded outputs (out_*.csv) on the re-created seeded fixture panel
  * (scripts/make_fixture.py; seed parity verified there).
  */
class GoldenParitySpec extends SparkSpec {

  private val res = "src/test/resources"
  private lazy val wide = spark.read.parquet(s"$res/panel/panel.parquet")
  private lazy val melted =
    Panel.melt(wide, "date", Seq("name"), Seq("feature_1", "feature_2", "feature_3"))

  private def golden(name: String): Seq[Map[String, String]] = {
    val lines = scala.io.Source.fromFile(s"$res/golden/$name").getLines().toSeq
    val header = lines.head.split(",", -1)
    lines.tail.filter(_.nonEmpty).map(l => header.zip(l.split(",", -1)).toMap)
  }

  private def approx(got: Double, want: Double, atol: Double, rtol: Double = 0.0): Boolean =
    math.abs(got - want) <= atol + rtol * math.abs(want)

  private def collectMap(df: DataFrame, keys: Seq[String]): Map[Seq[String], org.apache.spark.sql.Row] =
    df.collect().map(r => keys.map(k => r.getAs[Any](k).toString) -> r).toMap

  test("distribution diagnostics match out_distribution.csv") {
    val got = collectMap(Moments.distributionDiagnostics(melted), Seq("group_key", "feature"))
    val g = golden("out_distribution.csv")
    assert(g.size == 15)
    g.foreach { row =>
      val r = got(Seq(row("group"), row("feature")))
      for ((gc, sc) <- Seq("mean" -> "mean", "std" -> "std", "skew" -> "skew", "kurtosis" -> "kurtosis"))
        assert(approx(r.getAs[Double](sc), row(gc).toDouble, 1e-9),
          s"$row $gc: ${r.getAs[Double](sc)}")
    }
  }

  test("memory (acf + ljung-box + hurst) matches out_memory.csv") {
    // fused single-scan variant — same numbers as the standalone ops
    val got = collectMap(Lags.memoryDependence(melted), Seq("group_key", "feature"))
    val g = golden("out_memory.csv")
    assert(g.size == 15)
    g.foreach { row =>
      val r = got(Seq(row("group"), row("feature")))
      assert(approx(r.getAs[Double]("acf_lag1"), row("acf_lag1").toDouble, 1e-9))
      assert(approx(r.getAs[Double]("acf_lag5"), row("acf_lag5").toDouble, 1e-9))
      assert(approx(r.getAs[Double]("acf_lag10"), row("acf_lag10").toDouble, 1e-9))
      assert(approx(r.getAs[Double]("hurst_exp"), row("hurst_exp").toDouble, 1e-9))
      assert(approx(r.getAs[Double]("lb_p"), row("ljungbox_p").toDouble, 1e-9, 1e-9),
        s"$row lb_p: ${r.getAs[Double]("lb_p")}")
    }
  }

  test("stationarity (ADF + KPSS) matches out_stationarity.csv") {
    val got = collectMap(UnitRoots.stationarityTests(melted), Seq("group_key", "feature"))
    val g = golden("out_stationarity.csv")
    assert(g.size == 15)
    g.foreach { row =>
      val r = got(Seq(row("group"), row("feature")))
      assert(approx(r.getAs[Double]("adf_stat"), row("adf_stat").toDouble, 1e-7),
        s"$row adf_stat: ${r.getAs[Double]("adf_stat")}")
      assert(approx(r.getAs[Double]("adf_p"), row("adf_p").toDouble, 1e-8, 1e-5),
        s"$row adf_p: ${r.getAs[Double]("adf_p")}")
      assert(approx(r.getAs[Double]("kpss_stat"), row("kpss_stat").toDouble, 1e-7),
        s"$row kpss_stat: ${r.getAs[Double]("kpss_stat")}")
      assert(approx(r.getAs[Double]("kpss_p"), row("kpss_p").toDouble, 1e-8, 1e-6),
        s"$row kpss_p: ${r.getAs[Double]("kpss_p")}")
    }
  }

  test("stationarity summary matches out_stationarity_summary.csv") {
    val results = UnitRoots.stationarityTests(melted)
    val got = collectMap(
      results.groupBy("feature").agg(
        avg(when(col("adf_p") < 0.05, 1.0).otherwise(0.0)).as("pru"),
        avg(when(col("kpss_p") < 0.05, 1.0).otherwise(0.0)).as("prs")),
      Seq("feature"))
    golden("out_stationarity_summary.csv").foreach { row =>
      val r = got(Seq(row("feature")))
      assert(approx(r.getAs[Double]("pru"), row("prop_reject_unit_root").toDouble, 1e-9))
      assert(approx(r.getAs[Double]("prs"), row("prop_reject_stationarity").toDouble, 1e-9))
    }
  }

  test("frequency domain matches out_frequency.csv") {
    val got = collectMap(Periodogram.frequencyDomain(melted), Seq("group_key", "feature"))
    val g = golden("out_frequency.csv")
    assert(g.size == 15)
    g.foreach { row =>
      val r = got(Seq(row("group"), row("feature")))
      assert(approx(r.getAs[Double]("dom_freq"), row("dom_freq").toDouble, 1e-12))
      assert(approx(r.getAs[Double]("dom_power"), row("dom_power").toDouble, 1e-9, 1e-9))
    }
  }

  test("ar1 matches out_ar1.csv") {
    val got = collectMap(Lags.ar1(melted), Seq("group_key", "feature"))
    golden("out_ar1.csv").foreach { row =>
      val r = got(Seq(row("group"), row("feature")))
      assert(approx(r.getAs[Double]("ar1_r2"), row("ar1_r2").toDouble, 1e-9))
    }
  }

  test("cross-sectional dispersion matches golden CSV") {
    val d = Moments.crossSectionDispersion(melted, "feature_1").collect()
      .map(r => r.getAs[java.sql.Timestamp]("date").toString.take(10) ->
        r.getAs[Double]("dispersion_feature_1")).toMap
    golden("out_cross_section_dispersion_feature1.csv").foreach { row =>
      assert(approx(d(row("date").take(10)), row("dispersion_feature_1").toDouble, 1e-9))
    }
  }

  private val goldenPairs = Seq(("feature_1", "feature_2"), ("feature_1", "feature_3"))

  test("lagged cross correlation matches out_lagged_corr.csv") {
    val got = Lags.laggedCrossCorr(wide, "date", "name", goldenPairs, maxLag = 6)
      .collect().map(r => (r.getAs[String]("pair"), r.getAs[Int]("lag")) ->
        r.getAs[Double]("avg_corr")).toMap
    golden("out_lagged_corr.csv").foreach { row =>
      val lag = row("lag").toInt
      for (p <- Seq("feature_1|feature_2", "feature_1|feature_3"))
        assert(approx(got((p, lag)), row(p).toDouble, 1e-9), s"$p lag $lag")
    }
  }

  test("cointegration matches out_cointegration.csv") {
    val got = goldenPairs.map { case (fa, fb) =>
      (fa, fb) -> collectMap(
        CrossFeature.pairAnalysis(wide, "date", "name", fa, fb, maxLag = 6),
        Seq("group_key"))
    }.toMap
    golden("out_cointegration.csv").foreach { row =>
      val Array(fa, fb) = row("pair").split('|')
      val r = got((fa, fb))(Seq(row("group")))
      assert(approx(r.getAs[Double]("coint_stat"), row("coint_stat").toDouble, 1e-7),
        s"$row stat: ${r.getAs[Double]("coint_stat")}")
      assert(approx(r.getAs[Double]("coint_p"), row("coint_p").toDouble, 1e-8, 1e-5),
        s"$row p: ${r.getAs[Double]("coint_p")}")
    }
  }

  test("granger causality matches out_granger.csv") {
    val got = goldenPairs.map { case (fa, fb) =>
      (fa, fb) -> collectMap(
        CrossFeature.pairAnalysis(wide, "date", "name", fa, fb, maxLag = 6),
        Seq("group_key"))
    }.toMap
    golden("out_granger.csv").foreach { row =>
      val Array(fa, fb) = row("pair").split('|')
      val r = got((fa, fb))(Seq(row("group")))
      assert(approx(r.getAs[Double]("granger_p"), row("pvalue").toDouble, 1e-8, 1e-6),
        s"$row granger_p: ${r.getAs[Double]("granger_p")}")
    }
  }

  test("mutual information matches out_mutual_info.csv") {
    val got = goldenPairs.map { case (fa, fb) =>
      (fa, fb) -> collectMap(MutualInfo.mutualInfo(wide, "name", fa, fb), Seq("group_key"))
    }.toMap
    golden("out_mutual_info.csv").foreach { row =>
      val Array(fa, fb) = row("pair").split('|')
      val r = got((fa, fb))(Seq(row("group")))
      assert(approx(r.getAs[Double]("mi"), row("mi").toDouble, 1e-9),
        s"$row mi: ${r.getAs[Double]("mi")}")
    }
  }
}
