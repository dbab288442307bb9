package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import graft.core.Tables
import graft.ext.Dedup

/** Measurement tool for the round-9 hashKeys flip on the driver's
  * heaviest bench query: runs [[Dedup.dropDuplicateWindows]] with exact
  * string gram keys and with xxhash64 keys over the same documents
  * table, and reports wall (2 passes each, min is the steady state) AND
  * total shuffle write/read bytes from task metrics — the quantity the
  * flip actually targets. local[32] shuffles never touch a wire, so
  * wall parity here plus a large byte reduction is exactly the
  * at-cluster-scale win case; findings recorded in ARCHITECTURE.md.
  *
  * {{{ sbt "runMain graft.ProbeWindowDedup /root/testdata/sf0.1" }}} */
object ProbeWindowDedup {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shuffleWrite = new AtomicLong(0L)
    val shuffleRead = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })
    for (hash <- Seq(false, true); pass <- 1 to 2) {
      shuffleWrite.set(0L); shuffleRead.set(0L)
      val t0 = System.nanoTime()
      Dedup.dropDuplicateWindows(Tables.documents(spark, dir),
          windowTokens = 12, hashKeys = hash)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are posted async (listenerBus is private[spark]);
      // a short settle sleep drains the queue on a local master
      Thread.sleep(500)
      println(f"hashKeys=$hash pass $pass: $wall%.2f s, " +
        f"shuffle write ${shuffleWrite.get / 1e6}%.1f MB, read ${shuffleRead.get / 1e6}%.1f MB")
    }
    spark.stop()
  }
}
