package graft

import org.apache.spark.sql.SparkSession

/** Cold-compile A/B probe: times the named queries once each in a fresh
  * JVM (no warm pass), isolating per-plan Janino+JIT cost — the bucket
  * the minhash aggregate and window-corr plans dominate.
  * Usage: runMain graft.ProbeCold q_dedup_minhash_docs [more...] */
object ProbeCold {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm only the table scans, never the query plans
    Seq("lineitem", "part", "orders").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count() catch { case _: Throwable => () }
    }
    graft.core.Tables.events(spark, sfDir).count()
    graft.core.Tables.documents(spark, sfDir).count()
    graft.core.Tables.embeddings(spark, sfDir).count()
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      fn(spark, sfDir).count()
      val warm = (System.nanoTime() - t1) / 1e9
      println(f"$name: cold $cold%.2f s, warm $warm%.2f s, compile+jit ~${cold - warm}%.2f s")
    }
    spark.stop()
  }
}
