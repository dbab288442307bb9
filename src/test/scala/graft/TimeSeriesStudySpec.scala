package graft

import org.apache.spark.sql.functions._

/** Façade smoke/parity: the class-level API produces the same numbers the
  * operator-level golden suite already pins. */
class TimeSeriesStudySpec extends SparkSpec {

  private lazy val wide = spark.read.parquet("src/test/resources/panel/panel.parquet")
  private lazy val study = new TimeSeriesStudy(wide, "date", Seq("name"))

  test("feature discovery finds the three non-key columns") {
    assert(study.features.toSet == Set("feature_1", "feature_2", "feature_3"))
  }

  test("validation rejects missing and non-numeric features") {
    intercept[IllegalArgumentException] {
      new TimeSeriesStudy(wide, "date", Seq("name"), Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      new TimeSeriesStudy(wide.withColumn("bad", lit("x")), "date", Seq("name"),
        Seq("feature_1", "bad"))
    }
  }

  test("runAll mirrors the reference driver: every table written as CSV") {
    val dir = java.nio.file.Files.createTempDirectory("runall").toString
    val tables = study.runAll(dir)
    // the ten analyses plus the six cross-feature tables
    assert(tables.keySet == Set(
      "distribution", "stationarity", "stationarity_summary", "memory",
      "frequency", "dispersion", "ar1", "regimes", "volatility", "outliers",
      "cross_lagged_corr", "cross_lagged_corr_long", "cross_rolling_corr",
      "cross_cointegration", "cross_granger", "cross_mutual_info"),
      tables.keySet.toString)
    tables.foreach { case (name, df) =>
      assert(df.count() > 0, s"$name returned no rows")
      val out = spark.read.option("header", "true").csv(s"$dir/out_$name")
      assert(out.count() == df.count(), s"$name CSV row count")
    }
  }

  test("runAll publication flags: styled HTML per table, the reference PNG set") {
    val dir = java.nio.file.Files.createTempDirectory("publish").toString
    val tables = study.runAll(dir, publishHtml = true, publishPlots = true)
    // S3: one styled HTML per published table, row-for-row with the frame
    tables.foreach { case (name, df) =>
      val f = new java.io.File(s"$dir/out_$name.html")
      assert(f.exists, s"$name HTML missing")
      val html = new String(java.nio.file.Files.readAllBytes(f.toPath))
      assert(html.contains("font-weight: 600"), s"$name: style block")
      assert(html.sliding(8).count(_ == "<tr><td>") == df.count(), s"$name HTML rows")
    }
    // S4: the reference figure set, each a decodable canvas-sized PNG
    val pngs = Seq("stationarity_summary_bars", "frequency_scatter",
      "outlier_share_pie") ++
      Seq("feature_1", "feature_2", "feature_3").flatMap(f => Seq(
        s"distribution_skew_$f", s"distribution_kurtosis_$f",
        s"stationarity_dumbbell_$f", s"ar1_hist_$f"))
    pngs.foreach { n =>
      val img = javax.imageio.ImageIO.read(new java.io.File(s"$dir/$n.png"))
      assert(img != null && img.getWidth == graft.sinks.PlotSink.W &&
        img.getHeight == graft.sinks.PlotSink.H, s"$n.png")
    }
  }

  test("all ten analyses run end to end on the fixture panel") {
    assert(study.distributionDiagnostics().count() == 15)
    val (res, sum) = study.stationarityTests()
    assert(res.count() == 15 && sum.count() == 3)
    assert(study.memoryDependence().count() == 15)
    assert(study.frequencyDomain().count() == 15)
    assert(study.crossSectionalDispersion("feature_1").count() == 60)
    assert(study.predictabilityAr1().count() == 15)
    val xf = study.crossFeatureComparisons(
      Seq(("feature_1", "feature_2"), ("feature_1", "feature_3")), maxLag = 6)
    assert(xf("lagged_corr").count() == 7) // lags 0..6 pivoted
    assert(xf("lagged_corr").columns.toSet ==
      Set("lag", "feature_1|feature_2", "feature_1|feature_3")) // R2 pivot shape
    assert(xf("cointegration").count() == 10)
    assert(xf("granger").count() == 10)
    assert(xf("mutual_info").count() == 10)
    assert(study.regimeDetection("feature_1").count() == 5)
    assert(study.volatilityAnalysis("feature_1").count() == 5)
    assert(study.outlierDetection("feature_1").count() == 5)
  }

  test("unknown feature raises like the reference") {
    intercept[IllegalArgumentException] { study.crossSectionalDispersion("nope") }
  }

  test("csv + parquet sinks round-trip") {
    val tmp = java.nio.file.Files.createTempDirectory("tss_sink").toString
    val d = study.distributionDiagnostics()
    study.save(d, s"$tmp/p")
    study.saveCsv(d, s"$tmp/c")
    assert(spark.read.parquet(s"$tmp/p").count() == 15)
    assert(spark.read.option("header", "true").csv(s"$tmp/c").count() == 15)
  }
}
