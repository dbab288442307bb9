package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Suite-wide attribution probe (optimization guide §1 "measure first"
  * adapted to a 175-query suite): run every declared query once with the
  * Bench noop-write action and record, per query, wall seconds, Spark JOB
  * count, stage count, task count, and shuffle read/write bytes from a
  * listener. On local mode with sf0.1-sized data, per-job scheduling
  * latency is a first-order cost, so `jobs` tells you whether a slow query
  * is compute-bound (few jobs, many task-seconds) or CHAIN-bound (many
  * sequential jobs: checkpoint pins, broadcasts, driver-side iteration) —
  * two regimes with entirely different fixes (§2.4 vs §1.2).
  *
  * Usage: sbt "runMain graft.ProbeJobs [queryName ...]"
  *   (no args = all queries, alphabetical; SPARK_GRAFT_SF_DIR selects data)
  * Output: one TSV line per query to stdout, totals at the end. */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var shufRead = 0L
    @volatile var shufWrite = 0L
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        synchronized {
          stages += 1
          tasks += sc.stageInfo.numTasks
          shufRead += sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
          shufWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        }
    }
    spark.sparkContext.addSparkListener(listener)

    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    // warm pass (codegen/JIT/page cache) so the measured pass is steady state
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    Bench.resetStorage(spark)
    def drain(): Unit = Thread.sleep(250) // let straggler listener events land
    println("query\tsec\tjobs\tstages\ttasks\tshuf_read_mb\tshuf_write_mb")
    var totSec = 0.0; var totJobs = 0; var totTasks = 0
    names.foreach { n =>
      drain()
      jobs = 0; stages = 0; tasks = 0; shufRead = 0L; shufWrite = 0L
      val t0 = System.nanoTime()
      try SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"$n FAILED: $e") }
      val sec = (System.nanoTime() - t0) / 1e9
      drain()
      println(f"$n\t$sec%.3f\t$jobs\t$stages\t$tasks\t${shufRead / 1e6}%.2f\t${shufWrite / 1e6}%.2f")
      totSec += sec; totJobs += jobs; totTasks += tasks
    }
    println(f"TOTAL\t$totSec%.3f\t$totJobs\t-\t$totTasks\t-\t-")
    spark.stop()
  }
}
