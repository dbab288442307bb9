package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage attribution for ONE query (ProbeJobs' stage-level sibling):
  * warm pass, then a timed pass printing every stage's wall ms, task
  * count and name — the local-mode substitute for the Spark UI stage
  * table (guide §7.1) with the UI disabled.
  *
  * Usage: sbt "runMain graft.ProbeStages q_name [sfDir]" */
object ProbeStages {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    run(); run() // warm: codegen + JIT
    Bench.resetStorage(spark)
    val recs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for (s <- si.submissionTime; c <- si.completionTime) yield c - s).getOrElse(-1L)
        recs.add(f"stage ${si.stageId}%4d ${ms}%6d ms ${si.numTasks}%4d tasks  ${si.name.take(90)}")
      }
    })
    val t0 = System.nanoTime()
    run()
    println(f"$name timed: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    Thread.sleep(400)
    recs.forEach(println(_))
    spark.stop()
  }
}
