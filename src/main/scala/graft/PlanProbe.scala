package graft

import org.apache.spark.sql.SparkSession

/** Throwaway plan-audit tool (dev only): prints the formatted physical
  * plans of the similarity/dedup queries so exchange counts and reuse are
  * visible. Not part of the driver contract. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.drop(1)) {
      println(s"==== $q ====")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
