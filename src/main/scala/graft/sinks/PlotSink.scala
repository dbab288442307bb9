package graft.sinks

import java.awt.{BasicStroke, Color, Graphics2D, RenderingHints}
import java.awt.image.BufferedImage
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S4 — PNG plot sink (reference matplotlib publication,
  * time_series_study/time_series_study.py:164-178, 247-284, 350-362,
  * 418-431, 461-470, 510-521, 644-676, 979-1107): histograms, grouped
  * bars, scatters, dumbbells and pies over the analyses' RESULT tables,
  * drawn minimalist (white background, no grid, the fixed palette) and
  * saved as PNG.
  *
  * Spark-first split: the DATA REDUCTION is distributed —
  * [[histogramTable]] is a bounds aggregate plus a binned groupBy, the
  * other charts consume already-aggregate-sized analysis tables — and
  * only the raster is driver-side (pure Java2D geometry; no plotting
  * library). Every `save*` collects at most an aggregate-sized or
  * explicitly capped frame; nothing fact-sized ever reaches the driver.
  * Renders are deterministic geometry (rect/oval/arc fills — text labels
  * are titles only), so specs assert exact pixel colors.
  *
  * The reference returns the underlying frame and treats the PNG as a
  * side effect; [[saveHistogram]] keeps that contract. */
object PlotSink {

  /** Fixed color order (reference `_palette`, time_series_study.py:108-111). */
  val palette: IndexedSeq[Color] = IndexedSeq(
    "#000000", "#D62728", "#1F77B4", "#2CA02C", "#FF7F0E", "#9467BD", "#8C564B")
    .map(Color.decode)

  private def r6(c: Column) = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Distributed equal-width histogram (numpy/matplotlib convention:
    * `bins` equal widths over [min, max], last bin right-inclusive):
    * one 1-row bounds aggregate broadcast into the binning projection
    * (the globalOrdinal shape), then one binned groupBy — two
    * map-combinable aggregates, no fact-sized shuffle. Output
    * (bin, bin_lo, bin_hi, n), non-empty bins only, edges canonized.
    * Degenerate min = max collapses to bin 0. */
  def histogramTable(df: DataFrame, valueCol: String, bins: Int = 16): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val base = df.filter(col(valueCol).isNotNull && !isnan(col(valueCol)))
      .select(col(valueCol).cast("double").as("__v"))
    val bounds = base.agg(min("__v").as("__mn"), max("__v").as("__mx"))
    base.crossJoin(broadcast(bounds))
      .withColumn("bin",
        when(col("__mx") === col("__mn"), lit(0L))
          .otherwise(least(
            floor((col("__v") - col("__mn")) / (col("__mx") - col("__mn"))
              * lit(bins)).cast("long"),
            lit(bins - 1L))))
      .groupBy(col("bin"), col("__mn"), col("__mx"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        r6(col("__mn") + col("bin") * (col("__mx") - col("__mn")) / lit(bins.toDouble))
          .as("bin_lo"),
        r6(col("__mn") + (col("bin") + lit(1L)) * (col("__mx") - col("__mn"))
          / lit(bins.toDouble)).as("bin_hi"),
        col("n"))
      .orderBy("bin")
  }

  // Canvas geometry (9:3 inch reference figures at ~100 dpi); exposed to
  // the spec so pixel assertions derive from the same constants.
  private[graft] val W = 900
  private[graft] val H = 300
  private[graft] val ML = 50
  private[graft] val MR = 15
  private[graft] val MT = 25
  private[graft] val MB = 35
  private[graft] def plotW: Int = W - ML - MR
  private[graft] def plotH: Int = H - MT - MB

  private def canvas(title: String): (BufferedImage, Graphics2D) = {
    val img = new BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(Color.WHITE)
    g.fillRect(0, 0, W, H)
    g.setColor(Color.BLACK)
    if (title.nonEmpty) g.drawString(title, ML, 16)
    (img, g)
  }

  private def drawAxes(g: Graphics2D): Unit = {
    g.setColor(Color.BLACK)
    g.setStroke(new BasicStroke(1f))
    g.drawLine(ML, H - MB, W - MR, H - MB) // x axis
    g.drawLine(ML, MT, ML, H - MB)         // y axis
  }

  private def writePng(img: BufferedImage, g: Graphics2D, path: String): Unit = {
    g.dispose()
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    javax.imageio.ImageIO.write(img, "png", f)
    ()
  }

  /** Linear data→pixel maps; degenerate ranges pad ±1 so a constant
    * series still renders mid-plot. */
  private def xPix(v: Double, mn: Double, mx: Double): Int = {
    val (lo, hi) = if (mx > mn) (mn, mx) else (mn - 1.0, mx + 1.0)
    ML + math.round((v - lo) / (hi - lo) * plotW).toInt
  }
  private def yPix(v: Double, mn: Double, mx: Double): Int = {
    val (lo, hi) = if (mx > mn) (mn, mx) else (mn - 1.0, mx + 1.0)
    H - MB - math.round((v - lo) / (hi - lo) * plotH).toInt
  }

  /** Histogram PNG (reference hist panels, e.g. `:172-174`, `:358`,
    * `:517`): computes [[histogramTable]], rasterizes the (at most
    * `bins`-row) result, returns the table. */
  def saveHistogram(df: DataFrame, valueCol: String, path: String,
      bins: Int = 16, colorIdx: Int = 1, title: String = ""): DataFrame = {
    val table = histogramTable(df, valueCol, bins)
    val counts = new Array[Long](bins)
    table.collect().foreach(r => counts(r.getAs[Long]("bin").toInt) = r.getAs[Long]("n"))
    val maxN = math.max(1L, counts.max)
    val (img, g) = canvas(title)
    g.setColor(palette(colorIdx % palette.size))
    var b = 0
    while (b < bins) {
      val x0 = ML + b * plotW / bins
      val x1 = ML + (b + 1) * plotW / bins
      val hPix = math.round(counts(b).toDouble / maxN * plotH).toInt
      if (hPix > 0) g.fillRect(x0, H - MB - hPix, math.max(1, x1 - x0 - 1), hPix)
      b += 1
    }
    drawAxes(g)
    writePng(img, g, path)
    table
  }

  /** Scatter PNG (reference `:276-277`, `:425`, `:988`, `:1030`): points
    * are capped at `maxPoints` via limit — the reference scatters
    * aggregate-sized analysis tables, never facts. */
  def saveScatter(df: DataFrame, xCol: String, yCol: String, path: String,
      colorIdx: Int = 1, maxPoints: Int = 5000, title: String = ""): Unit = {
    val pts = df
      .filter(col(xCol).isNotNull && !isnan(col(xCol).cast("double")) &&
        col(yCol).isNotNull && !isnan(col(yCol).cast("double")))
      .select(col(xCol).cast("double"), col(yCol).cast("double"))
      .limit(maxPoints).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val (img, g) = canvas(title)
    if (pts.nonEmpty) {
      val (xs, ys) = (pts.map(_._1), pts.map(_._2))
      val (xmn, xmx, ymn, ymx) = (xs.min, xs.max, ys.min, ys.max)
      g.setColor(palette(colorIdx % palette.size))
      pts.foreach { case (x, y) =>
        g.fillOval(xPix(x, xmn, xmx) - 3, yPix(y, ymn, ymx) - 3, 7, 7)
      }
    }
    drawAxes(g)
    writePng(img, g, path)
  }

  /** Dumbbell PNG (reference stationarity dumbbells `:265-283`): one row
    * per label, a connector between the two series values and a dot per
    * series. Labels get evenly spaced y slots in frame order. */
  def saveDumbbell(df: DataFrame, labelCol: String, aCol: String, bCol: String,
      path: String, colorA: Int = 1, colorB: Int = 2, maxRows: Int = 500,
      title: String = ""): Unit = {
    val rows = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .orderBy(labelCol)
      .select(col(aCol).cast("double"), col(bCol).cast("double"))
      .limit(maxRows).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val (img, g) = canvas(title)
    if (rows.nonEmpty) {
      val all = rows.flatMap(t => Seq(t._1, t._2))
      val (mn, mx) = (all.min, all.max)
      val step = plotH.toDouble / (rows.length + 1)
      rows.zipWithIndex.foreach { case ((a, b), i) =>
        val y = MT + math.round((i + 1) * step).toInt
        val (xa, xb) = (xPix(a, mn, mx), xPix(b, mn, mx))
        g.setColor(Color.LIGHT_GRAY)
        g.drawLine(xa, y, xb, y)
        g.setColor(palette(colorA % palette.size))
        g.fillOval(xa - 3, y - 3, 7, 7)
        g.setColor(palette(colorB % palette.size))
        g.fillOval(xb - 3, y - 3, 7, 7)
      }
    }
    drawAxes(g)
    writePng(img, g, path)
  }

  /** Grouped-bars PNG (reference rejection-proportion bars `:254-258`):
    * two series side by side per label, bar heights from zero. */
  def saveGroupedBars(df: DataFrame, labelCol: String, aCol: String, bCol: String,
      path: String, colorA: Int = 1, colorB: Int = 2, maxRows: Int = 200,
      title: String = ""): Unit = {
    val rows = df.orderBy(labelCol)
      .select(col(aCol).cast("double"), col(bCol).cast("double"))
      .limit(maxRows).collect()
      .map(r => (if (r.isNullAt(0)) 0.0 else r.getDouble(0),
        if (r.isNullAt(1)) 0.0 else r.getDouble(1)))
    val (img, g) = canvas(title)
    if (rows.nonEmpty) {
      val maxV = math.max(rows.map(t => math.max(t._1, t._2)).max, 1e-12)
      val slot = plotW / rows.length
      val bw = math.max(1, slot / 3)
      rows.zipWithIndex.foreach { case ((a, b), i) =>
        val cx = ML + i * slot + slot / 2
        val ha = math.round(a / maxV * plotH).toInt
        val hb = math.round(b / maxV * plotH).toInt
        g.setColor(palette(colorA % palette.size))
        if (ha > 0) g.fillRect(cx - bw, H - MB - ha, bw, ha)
        g.setColor(palette(colorB % palette.size))
        if (hb > 0) g.fillRect(cx, H - MB - hb, bw, hb)
      }
    }
    drawAxes(g)
    writePng(img, g, path)
  }

  /** Pie PNG (reference outlier share pie `:1094-1096`): slices in frame
    * order, matplotlib's angle convention (start at 3 o'clock, counter-
    * clockwise), colored palette(1), palette(2), … (black reserved for
    * axes). Non-positive and null values are dropped. */
  def savePie(df: DataFrame, labelCol: String, valueCol: String, path: String,
      maxSlices: Int = 32, title: String = ""): Unit = {
    val vals = df.filter(col(valueCol).isNotNull)
      .orderBy(labelCol)
      .select(col(valueCol).cast("double"))
      .limit(maxSlices).collect().map(_.getDouble(0)).filter(_ > 0)
    val (img, g) = canvas(title)
    if (vals.nonEmpty) {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING, RenderingHints.VALUE_ANTIALIAS_OFF)
      val total = vals.sum
      val r = math.min(plotW, plotH) / 2 - 5
      val (cx, cy) = (ML + plotW / 2, MT + plotH / 2)
      var cum = 0.0
      vals.zipWithIndex.foreach { case (v, i) =>
        val a0 = math.round(cum / total * 360.0).toInt
        val a1 = math.round((cum + v) / total * 360.0).toInt
        g.setColor(palette(1 + i % (palette.size - 1)))
        g.fillArc(cx - r, cy - r, 2 * r, 2 * r, a0, math.max(a1 - a0, 0))
        cum += v
      }
    }
    writePng(img, g, path)
  }
}
