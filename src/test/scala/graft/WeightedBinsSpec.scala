package graft

import org.apache.spark.sql.DataFrame
import graft.ops.WeightedBins

/** Parity with the reference implementation executed as a black-box oracle
  * on its own fixtures (scripts/make_wb_golden.py): full-output compare on
  * the demo (5-row), comprehensive (seed-42 100-row), and generated
  * (seed-42 1000-row) datasets.
  */
class WeightedBinsSpec extends SparkSpec {

  private val res = "src/test/resources/wb"

  private def golden(name: String): Seq[Map[String, String]] = {
    val lines = scala.io.Source.fromFile(s"$res/${name}_golden.csv").getLines().toSeq
    val header = lines.head.split(",", -1)
    lines.tail.filter(_.nonEmpty).map(l => header.zip(l.split(",", -1)).toMap)
  }

  private def runCase(name: String, binSize: Double, maxBins: Int): (Seq[Map[String, String]], Array[org.apache.spark.sql.Row], DataFrame) = {
    val input = spark.read.parquet(s"$res/${name}_input.parquet")
    val out = WeightedBins.weightedBins(input, binSize = binSize, maxBins = maxBins)
      .orderBy("ID1", "ID2", "timestamp")
    (golden(name), out.collect(), out)
  }

  private def check(name: String, binSize: Double, maxBins: Int): Unit = {
    val (g, rows, out) = runCase(name, binSize, maxBins)
    assert(rows.length == g.size, s"row count ${rows.length} vs golden ${g.size}")
    val cols = Seq("ID1", "ID2") ++ (1 to maxBins).map(b => s"bin_${b}_avg")
    g.zip(rows).foreach { case (want, got) =>
      assert(got.getAs[String]("ID1") == want("ID1") && got.getAs[String]("ID2") == want("ID2"),
        s"key mismatch: $got vs $want")
      assert(got.getAs[Double]("quantity1") == want("quantity1").toDouble)
      (1 to maxBins).foreach { b =>
        val c = s"bin_${b}_avg"
        val wv = want(c)
        val gv = got.getAs[Double](c)
        if (wv.isEmpty) assert(gv.isNaN, s"$name $want $c: got $gv want NaN")
        else assert(math.abs(gv - wv.toDouble) < 1e-9, s"$name $c: got $gv want $wv")
      }
    }
  }

  test("demo case matches reference output (bins 22.5/32.5/50.0)") {
    check("demo", binSize = 100, maxBins = 3)
    val (_, rows, _) = runCase("demo", 100, 3)
    assert(rows(0).getAs[Double]("bin_1_avg") == 22.5)
    assert(rows(0).getAs[Double]("bin_2_avg") == 32.5)
    assert(rows(0).getAs[Double]("bin_3_avg") == 50.0)
  }

  test("comprehensive seed-42 case matches reference output row-for-row") {
    check("comprehensive", binSize = 50, maxBins = 8)
  }

  test("generated 1000-row case matches reference output row-for-row") {
    check("generated", binSize = 100, maxBins = 10)
  }

  test("property: one output row per input row minus one per group") {
    val input = spark.read.parquet(s"$res/generated_input.parquet")
    val out = WeightedBins.weightedBins(input)
    val groups = input.select("ID1", "ID2").distinct().count()
    assert(out.count() == input.count() - groups)
  }

  test("property: bounded streaming kernel is bit-equal to the full kernel") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 60) {
      val n = 1 + rnd.nextInt(250)
      // ~10% zero-mass rows exercises the held-to-group-end degenerate path
      val q1 = Array.fill(n)(if (rnd.nextInt(10) == 0) 0.0 else rnd.nextDouble() * 50)
      val q2 = Array.fill(n)(rnd.nextDouble() * 100 - 50)
      val binSize = 0.5 + rnd.nextDouble() * 60
      val maxBins = 1 + rnd.nextInt(12)
      val full = WeightedBins.binsForGroup(q1, q2, binSize, maxBins)
      val bounded = WeightedBins.binsForGroupBounded(q1, q2, binSize, maxBins)
      assert(full.length == bounded.length, s"trial=$trial length mismatch")
      for (i <- full.indices; b <- 0 until maxBins) {
        val (x, y) = (full(i)(b), bounded(i)(b))
        assert((x.isNaN && y.isNaN) || x == y,
          s"trial=$trial n=$n binSize=$binSize maxBins=$maxBins row=$i bin=$b: full=$x bounded=$y")
      }
    }
  }

  test("quirk Q6: negative quantity1 fails loud (documented deviation)") {
    // The reference silently computes garbage on negative q1 (non-monotone
    // cumsum — weighted_bin_calculator.py:108-110); the engine rejects it.
    val ex = intercept[IllegalArgumentException] {
      WeightedBins.binsForGroupBounded(Array(5.0, -3.0, 4.0), Array(1.0, 2.0, 3.0), 10.0, 4)
    }.getMessage
    assert(ex.contains("quantity1 >= 0") && ex.contains("-3.0"), s"got: $ex")
  }

  test("property: bin averages bounded by future q2 range") {
    val input = spark.read.parquet(s"$res/comprehensive_input.parquet")
    import org.apache.spark.sql.functions._
    val out = WeightedBins.weightedBins(input, binSize = 50, maxBins = 8)
    val mm = input.agg(min("quantity2"), max("quantity2")).head()
    val (lo, hi) = (mm.getLong(0).toDouble, mm.getLong(1).toDouble)
    (1 to 8).foreach { b =>
      val bad = out.filter(!isnan(col(s"bin_${b}_avg")) &&
        (col(s"bin_${b}_avg") < lo || col(s"bin_${b}_avg") > hi)).count()
      assert(bad == 0, s"bin $b out of [$lo,$hi]")
    }
  }
}
