package graft

import java.nio.file.Files
import graft.sinks.{HtmlSink, PlotSink}

/** S3/S4 sink coverage: exact-string HTML rendering (escaping, null,
  * limit) and exact-pixel PNG geometry (the renders are pure rect/oval/
  * arc fills, so colors at computed coordinates are deterministic). */
class SinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory("graft_sink").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/$name"
  }

  private def rgb(path: String, x: Int, y: Int): Int =
    javax.imageio.ImageIO.read(new java.io.File(path)).getRGB(x, y) & 0xFFFFFF

  test("HtmlSink.toHtmlTable: exact output incl escaping and null cells") {
    val df = Seq((1L, Option("a<b&c"), Option(2.5)), (2L, Option.empty[String], Option.empty[Double]))
      .toDF("id", "txt", "x")
    val html = HtmlSink.toHtmlTable(df)
    assert(html ==
      """<html><head><meta charset="utf-8"><style>
        |table.graft { border-collapse: collapse; }
        |table.graft th { font-weight: 600; text-align: center; }
        |table.graft td { padding: 4px 8px; }
        |</style></head><body><table class="graft">
        |<thead><tr><th>id</th><th>txt</th><th>x</th></tr></thead>
        |<tbody>
        |<tr><td>1</td><td>a&lt;b&amp;c</td><td>2.5</td></tr>
        |<tr><td>2</td><td></td><td></td></tr>
        |</tbody>
        |</table></body></html>
        |""".stripMargin, s"got:\n$html")
  }

  test("HtmlSink: head(1000) limit like the reference; saveTable writes the file") {
    val big = spark.range(1500).toDF("id")
    val html = HtmlSink.toHtmlTable(big)
    assert(html.sliding(8).count(_ == "<tr><td>") == 1000)
    val p = tmp("t")
    HtmlSink.saveTable(big.limit(3), p)
    val s = new String(Files.readAllBytes(java.nio.file.Paths.get(p + ".html")))
    assert(s.contains("<td>0</td>") && s.contains("<td>2</td>"))
  }

  test("histogramTable: numpy-convention bins, right-inclusive max, degenerate") {
    // 0..15 into 4 bins of width 4: 4 per bin; 15 (== max) joins the last
    val df = (0 until 16).map(_.toDouble).toDF("v")
    val out = PlotSink.histogramTable(df, "v", bins = 4).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Double]("bin_lo"),
        r.getAs[Double]("bin_hi"), r.getAs[Long]("n")))
    assert(out.toSeq == Seq((0L, 0.0, 3.75, 4L), (1L, 3.75, 7.5, 4L),
      (2L, 7.5, 11.25, 4L), (3L, 11.25, 15.0, 4L)), s"got ${out.toSeq}")
    // constant input: single bin 0, zero-width edges
    val const = Seq(2.0, 2.0, 2.0).toDF("v")
    val c = PlotSink.histogramTable(const, "v", bins = 4).collect()
    assert(c.length == 1 && c(0).getAs[Long]("bin") == 0L && c(0).getAs[Long]("n") == 3L)
    // nulls and NaN are dropped
    val dirty = Seq(Option(1.0), None, Option(Double.NaN), Option(2.0)).toDF("v")
    assert(PlotSink.histogramTable(dirty, "v", bins = 2).collect().map(_.getAs[Long]("n")).sum == 2L)
  }

  test("saveHistogram: tallest bar reaches the plot top; empty bin stays white") {
    import PlotSink._
    // bins = 2: bin 0 count 3 (full height), bin 1 count 0
    val df = Seq(0.0, 0.1, 0.2, 1.0).toDF("v") // max 1.0 joins bin 1 -> counts (3, 1)
    val p = tmp("h.png")
    val table = PlotSink.saveHistogram(df, "v", p, bins = 2, colorIdx = 1)
    assert(table.collect().map(_.getAs[Long]("n")).toSeq == Seq(3L, 1L))
    val red = palette(1).getRGB & 0xFFFFFF
    // center of bar 0 near the top of the plot area: full-height bar
    assert(rgb(p, ML + plotW / 4, MT + 2) == red)
    // bar 1 is 1/3 height: its top region is white, its base is red
    assert(rgb(p, ML + 3 * plotW / 4, MT + 2) == 0xFFFFFF)
    assert(rgb(p, ML + 3 * plotW / 4, H - MB - 2) == red)
    // axes are black
    assert(rgb(p, ML, H - MB) == 0x000000)
  }

  test("saveScatter: corner points land at the plot rect corners") {
    import PlotSink._
    val df = Seq((0.0, 0.0), (10.0, 10.0)).toDF("x", "y")
    val p = tmp("s.png")
    PlotSink.saveScatter(df, "x", "y", p, colorIdx = 2)
    val blue = palette(2).getRGB & 0xFFFFFF
    assert(rgb(p, ML + 1, H - MB - 1) == blue)  // (0,0) -> bottom-left
    assert(rgb(p, W - MR - 1, MT + 1) == blue)  // (10,10) -> top-right
    assert(rgb(p, ML + plotW / 2, MT + plotH / 2) == 0xFFFFFF) // middle empty
  }

  test("savePie: matplotlib angle convention, slice shares by value") {
    import PlotSink._
    // 3:1 split -> slice 1 covers [0, 270) CCW from 3 o'clock, slice 2 the rest
    val df = Seq(("a", 3.0), ("b", 1.0)).toDF("slice", "v")
    val p = tmp("p.png")
    PlotSink.savePie(df, "slice", "v", p)
    val (cx, cy) = (ML + plotW / 2, MT + plotH / 2)
    val r2 = (math.min(plotW, plotH) / 2 - 5) / 2
    def at(deg: Double) = rgb(p,
      cx + (r2 * math.cos(math.toRadians(deg))).toInt,
      cy - (r2 * math.sin(math.toRadians(deg))).toInt)
    val (c1, c2) = (palette(1).getRGB & 0xFFFFFF, palette(2).getRGB & 0xFFFFFF)
    assert(at(45) == c1 && at(135) == c1 && at(225) == c1, "first 270 degrees")
    assert(at(315) == c2, "last quadrant")
    // outside the disk: white
    assert(rgb(p, cx, MT + 1) == 0xFFFFFF)
  }

  test("saveDumbbell and saveGroupedBars render both series colors") {
    import PlotSink._
    val db = Seq(("g1", 0.1, 0.9), ("g2", 0.4, 0.6)).toDF("g", "a", "b")
    val p1 = tmp("d.png")
    PlotSink.saveDumbbell(db, "g", "a", "b", p1)
    val img1 = javax.imageio.ImageIO.read(new java.io.File(p1))
    val pix1 = (0 until img1.getWidth).flatMap(x => (0 until img1.getHeight)
      .map(y => img1.getRGB(x, y) & 0xFFFFFF)).toSet
    assert(pix1.contains(palette(1).getRGB & 0xFFFFFF))
    assert(pix1.contains(palette(2).getRGB & 0xFFFFFF))
    val p2 = tmp("b.png")
    PlotSink.saveGroupedBars(db, "g", "a", "b", p2)
    // g1's b-bar (0.9 = max) reaches the plot top just right of slot center
    val slot = plotW / 2
    assert(rgb(p2, ML + slot / 2 + 2, MT + 2) == (palette(2).getRGB & 0xFFFFFF))
    // g1's a-bar (0.1) is short: base colored, top white
    assert(rgb(p2, ML + slot / 2 - 2, H - MB - 2) == (palette(1).getRGB & 0xFFFFFF))
    assert(rgb(p2, ML + slot / 2 - 2, MT + 2) == 0xFFFFFF)
  }
}
