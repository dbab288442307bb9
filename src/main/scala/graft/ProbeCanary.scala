package graft

import org.apache.spark.sql.SparkSession

/** Round-12 calibration for the Bench ambient-slow canary (round-11
  * verdict task 2): the round-11 official bench's run 3 was ~15% slow
  * with internally-consistent passes — load, GC and pass-spread all read
  * "clean", so the degraded stamp missed a uniformly-slow box. The fix
  * is a fixed-cost calibration job (single-partition xxhash64 fold over
  * a constant range — data-independent, allocation-light, codegen'd)
  * timed immediately before and after Bench's timed passes; a run whose
  * canary exceeds the pinned quiet budget is stamped "ambient_slow".
  *
  * This probe measures the canary's quiet steady-state cost (warm once
  * for codegen/JIT, then N timed repeats) so the budget constant in
  * [[Bench]] is a recorded measurement, not a guess. Optionally pass
  * `loaded` to re-measure under a saturating background spin — the
  * deliberate trip demonstration. Findings: ARCHITECTURE.md. */
object ProbeCanary {
  // the probe times the SAME definition Bench stamps with, so the pinned
  // budget is a measurement of the shipping code path
  def canarySec(spark: SparkSession): Double = Bench.canarySec(spark)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loaded = args.contains("loaded")
    val spinners =
      if (!loaded) Seq.empty
      else (1 to Runtime.getRuntime.availableProcessors()).map { _ =>
        val t = new Thread(() => {
          var x = 1L
          while (!Thread.currentThread().isInterrupted) x = x * 6364136223846793005L + 1442695040888963407L
          if (x == 0L) println(x) // keep the loop un-eliminable
        })
        t.setDaemon(true); t.start(); t
      }
    canarySec(spark) // codegen + JIT warm — the budget is steady-state
    val runs = (1 to 10).map(_ => canarySec(spark))
    spinners.foreach(_.interrupt())
    val sorted = runs.sorted
    println(f"[canary] mode=${if (loaded) "loaded" else "quiet"} " +
      f"runs=${runs.map(r => f"$r%.3f").mkString(",")} " +
      f"min=${sorted.head}%.3f median=${sorted(runs.size / 2)}%.3f max=${sorted.last}%.3f")
    spark.stop()
  }
}
