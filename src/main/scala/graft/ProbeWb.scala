package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{WbRow, WeightedBins}

/** Weighted-bins scale probe (committed so it re-runs per round — results in
  * ARCHITECTURE.md):
  *
  * 1. The 1M-row head-to-head the reference publishes numbers for
  *    (reference README.md:144-146: ~2-5 s @ 100k rows, ~20-50 s @ 1M,
  *    single-core pandas/numpy): exactly 1,000,000 rows in a realistic
  *    many-group shape, run end-to-end through the DataFrame operator.
  * 2. A hot-key probe: the SAME 1M rows in ONE group — the shape the
  *    round-5 scale audit flagged as the kernel's viral-key OOM risk.
  *    Before round 6 this materialized a 1M-row array in one task; the
  *    bounded kernel streams it, and the direct-kernel run reports the
  *    pending-buffer high-water mark to prove task memory is bin-span-
  *    bounded, not group-size-bounded.
  *
  * Usage: runMain graft.ProbeWb [nRows]  (default 1,000,000; round 7 also
  * ran 10,000,000 — see ARCHITECTURE.md for both ledger entries)
  */
object ProbeWb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nRows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nGroups = 200
    // deterministic synthetic panel: q1 in [1, 100], q2 in [0, 50); same
    // distributional shape for both probes so times are comparable
    def synth(groups: Int) = spark.range(nRows).select(
      concat(lit("g"), (col("id") % groups).cast("string")).as("ID1"),
      lit("x").as("ID2"),
      timestamp_seconds(lit(1700000000L) + (col("id") / groups)).as("timestamp"),
      (pmod(hash(col("id")), lit(100)) + lit(1)).cast("double").as("quantity1"),
      (pmod(hash(col("id") + 7), lit(5000)).cast("double") / lit(100.0)).as("quantity2"),
      col("id").as("seq"))

    import ProbeUtil.time

    val many = synth(nGroups).cache(); many.count()
    // warm plan shape once so the timed run is steady-state (codegen/JIT)
    WeightedBins.weightedBins(many.limit(10000), tieCols = Seq("seq")).count()
    val out1 = time(s"$nRows rows / $nGroups groups (reference @1M: 20-50 s single-core)") {
      WeightedBins.weightedBins(many, tieCols = Seq("seq")).count()
    }
    println(s"[probe_wb] output rows: $out1")

    val hot = synth(1).cache(); hot.count()
    val out2 = time(s"$nRows rows / ONE group (viral-key shape)") {
      WeightedBins.weightedBins(hot, tieCols = Seq("seq")).count()
    }
    println(s"[probe_wb] hot-key output rows: $out2")

    // direct-kernel pass over the same hot group: measure the pending-buffer
    // high-water mark. Expected ≈ binSize·maxBins / E[q1] + O(1) rows
    // (= 1000/50.5 ≈ 20), vs the 1M rows the round-5 kernel materialized.
    val rows = hot.orderBy("seq").select("quantity1", "quantity2")
      .limit(1000000).collect() // driver-side pass stays 1M-capped; the distributed run above covers the full size
    val kernel = new WeightedBins.BoundedKernel(100.0, 10)
    val ts = new java.sql.Timestamp(0L)
    var emitted = 0L
    rows.zipWithIndex.foreach { case (r, i) =>
      kernel.push(WbRow("g", "x", ts, r.getDouble(0), r.getDouble(1), i.toLong))
        .foreach(_ => emitted += 1)
    }
    kernel.finish().foreach(_ => emitted += 1)
    println(s"[probe_wb] hot-key kernel: emitted=$emitted peak_pending_rows=${kernel.peakPending} (group size ${rows.length})")
    spark.stop()
  }
}
