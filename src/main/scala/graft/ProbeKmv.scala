package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** KMV cost attribution: the sf0.1 bench showed q_kmv_distinct_lineitem at
  * 3.8 s while q_hll_distinct_lineitem (same scan, same mixed hash) ran
  * 0.19 s. Root cause (the udaf_goodfilter variant proves it): the
  * original code null-filtered the DERIVED hash column, which pushed
  * isnotnull(<the whole mixHash tree>) into the scan filter; the nested
  * split-multiply duplicates its base subtree ~3^rounds times and the
  * oversized condition evaluates those duplicates per row (~7 µs/row).
  * The typed udaf itself is NOT the cost: with the filter on the input
  * column it matches the mapPartitions rewrite (~0.33 s). */
object ProbeKmv {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.{Sampling, Sketches}

    val li = graft.core.Tables.lineitem(spark, sfDir).select(col("l_partkey"))
    li.count()

    def t(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"$label%-28s pass$i ${(System.nanoTime() - t0) / 1e9}%6.3fs")
      }
    }

    t("hash_only_count") {
      li.select(Sketches.mixHash(col("l_partkey")).as("h")).agg(max("h")).collect()
    }
    t("udaf_library") {
      Sketches.kmvDistinct(li, "l_partkey", 256).collect()
    }
    t("udaf_badfilter_on_hash") {
      val kmin = udaf(new graft.ext.KMinAgg(256))
      li.select(Sketches.mixHash(col("l_partkey")).as("h"))
        .filter(col("h").isNotNull)
        .agg(kmin(col("h"))).collect()
    }
    t("udaf_goodfilter_on_input") {
      val kmin = udaf(new graft.ext.KMinAgg(256))
      li.filter(col("l_partkey").isNotNull)
        .select(Sketches.mixHash(col("l_partkey")).as("h"))
        .agg(kmin(col("h"))).collect()
    }
    t("distinct_orderby_limit") {
      li.select(Sketches.mixHash(col("l_partkey")).as("h"))
        .distinct().orderBy("h").limit(256).collect()
    }
    t("udaf_on_predistinct") {
      val kmin = udaf(new graft.ext.KMinAgg(256))
      li.select(Sketches.mixHash(col("l_partkey")).as("h")).distinct()
        .agg(kmin(col("h"))).collect()
    }
    t("exact_countdistinct") {
      li.agg(countDistinct(col("l_partkey"))).collect()
    }
    t("mappartitions_partial_udaf") {
      import spark.implicits._
      val kmin = udaf(new graft.ext.KMinAgg(256))
      val partial = li.select(Sketches.mixHash(col("l_partkey")).as("h")).as[Long]
        .mapPartitions { it =>
          val agg = new graft.ext.KMinAgg(256)
          var buf = agg.zero
          it.foreach { h => buf = agg.reduce(buf, h) }
          buf.iterator
        }
      partial.toDF("h").agg(kmin(col("h"))).collect()
    }
    spark.stop()
  }
}
