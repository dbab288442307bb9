package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Panel

/** K12 — weighted forward binning, the reference's flagship operator
  * (weighted_bin_calculator.py:6-171).
  *
  * Per (ID1, ID2), events ordered by timestamp: for every event except the
  * last of its group (`:96-98` — the last row emits nothing), consume the
  * strictly-later events in order, pack their q1 mass into `maxBins` bins of
  * `binSize` units, splitting an event that straddles a boundary
  * proportionally (`:118-134`), and emit per bin the q2-weighted average of
  * the q1 mass that actually landed in the bin — a partial final bin divides
  * by its fill, not binSize (`:136-141`); untouched bins are NaN.
  *
  * Algorithm: the reference's per-row rescan is O(n²·bins) per group. Here:
  * one pass builds prefix sums C(k)=Σq1, W(k)=Σq1·q2; for row i bin b covers
  * absolute-mass [C(i+1)+b·s, C(i+1)+(b+1)·s), and its weighted sum is the
  * difference of the piecewise-linear interpolant of W in C-coordinates at
  * the bin edges. Because C(i+1) grows with i, each of the maxBins+1 edge
  * pointers only moves forward — amortized O(n·maxBins) per group, same
  * float semantics (verified bit-close against the reference on its own
  * fixtures, WeightedBinsSpec).
  *
  * Scale: one hash shuffle on (id1, id2); each group's events are
  * materialized in one task (inherent to a forward-looking scan); the
  * parallelism axis is group count. Ties on timestamp are broken by the
  * optional `tieCols` for determinism (the reference's unstable quicksort
  * makes tied-order implementation-defined — documented deviation Q2).
  */
// top-level (non-private) so Catalyst's generated projections can reach them
case class WbRow(id1: String, id2: String, ts: java.sql.Timestamp,
    q1: Double, q2: Double, tie: Long)
case class WbOut(id1: String, id2: String, timestamp: java.sql.Timestamp,
    tie: Long, quantity1: Double, quantity2: Double, bins: Array[Double])

object WeightedBins {

  /** Kernel on one time-sorted group; returns per-row bin averages
    * (NaN = untouched), dropping the last row. */
  private[graft] def binsForGroup(
      q1: Array[Double], q2: Array[Double], binSize: Double, maxBins: Int): Array[Array[Double]] = {
    val n = q1.length
    val c = new Array[Double](n + 1) // prefix q1 mass
    val w = new Array[Double](n + 1) // prefix q1·q2 mass
    var k = 0
    while (k < n) {
      // precondition: prefix mass C must be monotone for the forward-only
      // edge pointers and the piecewise-linear interpolation to be valid —
      // negative mass would silently diverge from the reference's
      // sequential consume-and-split semantics, so fail loudly instead
      require(q1(k) >= 0.0,
        s"weightedBins requires quantity1 >= 0 within each group; got ${q1(k)}")
      c(k + 1) = c(k) + q1(k); w(k + 1) = w(k) + q1(k) * q2(k); k += 1
    }
    val total = c(n)

    // W interpolated at absolute mass m, with j = max index s.t. C(j) <= m
    @inline def wat(m: Double, j: Int): Double =
      if (j >= n) w(n) else w(j) + (m - c(j)) * q2(j)

    val ptr = new Array[Int](maxBins + 1) // edge pointers, monotone in i
    val out = new Array[Array[Double]](math.max(n - 1, 0))
    var i = 0
    while (i < n - 1) {
      val base = c(i + 1)
      val row = new Array[Double](maxBins)
      var b = 0
      while (b <= maxBins) {
        val m = base + b * binSize
        var j = math.max(ptr(b), i + 1)
        while (j < n && c(j + 1) <= m) j += 1
        ptr(b) = j
        b += 1
      }
      b = 0
      while (b < maxBins) {
        val lo = base + b * binSize
        val hi = math.min(base + (b + 1) * binSize, total)
        val fill = hi - lo
        row(b) =
          if (fill > 0) (wat(hi, ptr(b + 1)) - wat(lo, ptr(b))) / fill
          else Double.NaN
        b += 1
      }
      out(i) = row
      i += 1
    }
    out
  }

  /** DataFrame operator.
    *
    * Fails loudly (executor-side `require`) on any negative `q1Col` value:
    * negative mass breaks the monotone-prefix invariant the interpolation
    * depends on, and the alternative is silently wrong output. Callers with
    * possibly-negative quantities must pre-filter or validate upstream —
    * one bad row fails the whole job by design.
    *
    * `tieCols` break timestamp ties deterministically:
    * a single numeric column is used directly as the sort key (order-
    * preserving, so an external oracle can reproduce the ordering); multiple
    * columns are hashed into one long (deterministic but engine-specific). */
  def weightedBins(
      df: DataFrame,
      id1Col: String = "ID1",
      id2Col: String = "ID2",
      tsCol: String = "timestamp",
      q1Col: String = "quantity1",
      q2Col: String = "quantity2",
      binSize: Double = 100.0,
      maxBins: Int = 10,
      tieCols: Seq[String] = Seq(),
      emitTie: Boolean = false): DataFrame = {
    Panel.requireColumns(df, Seq(id1Col, id2Col, tsCol, q1Col, q2Col) ++ tieCols)
    val ss = df.sparkSession
    import ss.implicits._
    val tie: Column =
      if (tieCols.isEmpty) lit(0L)
      else if (tieCols.size == 1) {
        // direct cast ONLY for integral columns (order-preserving AND safe);
        // strings would throw CAST_INVALID_INPUT under ANSI and timestamps
        // would collapse sub-second ties to epoch seconds — hash those
        import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
        df.schema(tieCols.head).dataType match {
          case ByteType | ShortType | IntegerType | LongType => col(tieCols.head).cast("long")
          case _ => xxhash64(col(tieCols.head))
        }
      } else xxhash64(tieCols.map(col): _*)
    val ds = df.select(
      col(id1Col).cast("string").as("id1"),
      col(id2Col).cast("string").as("id2"),
      col(tsCol).cast("timestamp").as("ts"),
      col(q1Col).cast("double").as("q1"),
      col(q2Col).cast("double").as("q2"),
      tie.as("tie")).as[WbRow]
    val result = ds
      .groupByKey(r => (r.id1, r.id2))
      .flatMapGroups { (key: (String, String), it: Iterator[WbRow]) =>
        val rows = it.toArray.sortBy(r => (r.ts.getTime, r.tie))
        val bins = binsForGroup(rows.map(_.q1), rows.map(_.q2), binSize, maxBins)
        Iterator.tabulate(math.max(rows.length - 1, 0)) { i =>
          val r = rows(i)
          WbOut(key._1, key._2, r.ts, r.tie, r.q1, r.q2, bins(i))
        }
      }
      .toDF()
    val binCols = (0 until maxBins).map(b => col("bins")(b).as(s"bin_${b + 1}_avg"))
    val tieCol = if (emitTie) Seq(col("tie")) else Seq()
    result.select(
      Seq(col("id1").as(id1Col), col("id2").as(id2Col), col("timestamp").as(tsCol)) ++
        tieCol ++
        Seq(col("quantity1").as(q1Col), col("quantity2").as(q2Col)) ++ binCols: _*)
  }
}
