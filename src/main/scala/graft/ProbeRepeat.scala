package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-7 regression forensics (round-6 verdict task 1): the committed
  * 3-repeat driver-shape protocol (ARCHITECTURE.md noise-floor entry)
  * applied to the five queries the r6 driver pass graded perf-weak
  * (q_repetition_docs 8.8×, q_rolling_corr_lineitem 7.4×, q_rollup_docs
  * 6.3×, q_regimes_events 5.6×, q_rrf_hybrid_docs 2.0×).
  *
  * Shape: full untimed warm pass over ALL queries (the driver bench's
  * warm), then per target: storage reset (the driver's timed-pass
  * starting state) and 3 timed repeats — repeat 1 approximates the
  * driver's number, repeats 2–3 the steady state. For q_rollup_docs an
  * A/B variant without the round-6 `grouping()` indicator columns
  * isolates that plan change. */
object ProbeRepeat {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val targets = if (args.nonEmpty) args.toSeq else Seq(
      "q_repetition_docs", "q_rolling_corr_lineitem", "q_rollup_docs",
      "q_regimes_em2_events", "q_rrf_hybrid_docs") // regimes target tracks the r13 query rename

    // the driver bench's warm pass, verbatim shape
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }

    def time3(label: String)(run: => Unit): Unit = {
      Bench.resetStorage(spark)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-34s ${times.map(t => f"$t%6.2f").mkString(" ")}")
    }

    targets.foreach { name =>
      time3(name) { SparkEntry.queries(name)(spark, sfDir).count() }
    }
    // A/B: rollup without the grouping() indicator columns (plan change r6)
    time3("rollup_docs_NO_grouping_cols") {
      graft.core.Tables.documents(spark, sfDir)
        .cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
          sum(ext.TextStats.wsTokenCount(col("text")).cast("long")).as("sum_tokens"))
        .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)
        .count()
    }
  }
}
