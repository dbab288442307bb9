package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-10 closure of the recurring weighted-bins attribution anomaly
  * (round-8 AND round-9 attribution tables read exec ≈ 3.5 s for
  * q_weighted_bins_lineitem while the clean bench and ProbeWb read
  * 1.2–1.8 s — twice attributed to machine load, never measured).
  *
  * Hypothesis under test: the discrepancy is the ATTRIBUTION HARNESS'S
  * OWN ACTION, not the query. ProbeCompile times `.collect()`;
  * Bench/ProbeWb time a `noop` write. q_weighted_bins_lineitem is the
  * suite's only heavy query whose OUTPUT is corpus-sized (≈ 560k rows
  * at sf0.1 — the forward-bin values are per-row), so collect pays
  * seconds of driver-side row materialization that the noop action
  * never sees; for the aggregate-output queries that dominate the
  * table, the two actions agree and the table looked trustworthy.
  *
  * The discriminating measurement: min-of-2 fresh runs under each
  * action with a task-metrics listener — if EXECUTOR-side totals
  * (executor run/CPU time, GC, shuffle bytes) are the same under both
  * actions while wall time differs by the bench-vs-attribution gap,
  * the gap lives on the driver in the action itself, and the anomaly
  * is closed as a harness artifact (and ProbeCompile's action is
  * switched to noop so future tables measure what the bench measures).
  *
  * {{{ runMain graft.ProbeWbAttrib /root/testdata/sf0.1 }}} */
object ProbeWbAttrib {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shufW = new AtomicLong(0L); val shufR = new AtomicLong(0L)
    val execRun = new AtomicLong(0L); val execCpu = new AtomicLong(0L)
    val gc = new AtomicLong(0L); val resultBytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          execRun.addAndGet(m.executorRunTime)
          execCpu.addAndGet(m.executorCpuTime)
          gc.addAndGet(m.jvmGCTime)
          resultBytes.addAndGet(m.resultSize)
        }
      }
    })
    val fn = SparkEntry.queries("q_weighted_bins_lineitem")
    fn(spark, dir).count() // warm scan caches + codegen, the ProbeCompile preamble
    for (action <- Seq("noop", "collect"); pass <- 1 to 2) {
      Seq(shufW, shufR, execRun, execCpu, gc, resultBytes).foreach(_.set(0L))
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val rows = action match {
        case "noop" => df.write.format("noop").mode("overwrite").save(); -1L
        case _ => df.collect().length.toLong
      }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus is async; settle before reading
      println(f"$action%-7s pass $pass: wall $wall%.2f s | executor run ${execRun.get / 1e3}%.1f s" +
        f" cpu ${execCpu.get / 1e9}%.1f s gc ${gc.get / 1e3}%.2f s" +
        f" | shuffle w ${shufW.get / 1e6}%.1f MB r ${shufR.get / 1e6}%.1f MB" +
        f" | task-result ${resultBytes.get / 1e6}%.1f MB" +
        (if (rows >= 0) f" | $rows rows to driver" else ""))
    }
    spark.stop()
  }
}
