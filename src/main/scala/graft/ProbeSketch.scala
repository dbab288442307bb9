package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Sketches

/** Scale-axis probe for the round-7 sketch family: CMS counters and the
  * HDR histogram claim "the shuffle carries sketch-sized state, never
  * data" — so 10× the input rows must cost ~10× the map-side scan and
  * ~0× the shuffle/merge. Measures wall time at 1M vs 10M synthetic
  * tokens/values (the documents table is too small to separate axes,
  * same reasoning as ProbeBpe) and a width axis for CMS.
  *
  * Token synthesis stays off the driver: `spark.range` → arithmetic
  * token ids → concat string tokens, all distributed. Zipf-ish skew via
  * pmod of a quadratic — hot tokens exercise the map-side combine.
  */
object ProbeSketch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(label: String)(run: => Unit): Unit = {
      val t0 = System.nanoTime()
      run
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    // ~100k-token vocabulary, quadratic mix for skew: token 0 is viral
    def toks(n: Long) = spark.range(n)
      .select(concat(lit("tok"),
        pmod(col("id") * col("id") + col("id") * 7919L, lit(100000L))).as("tok"))

    def vals(n: Long) = spark.range(n)
      .select(pmod(col("id") * 2654435761L, lit(10000000L)).as("v"))

    // warm-up: a full pass of each shape
    Sketches.cmsCounters(toks(100000L), "tok", 1024, 4).count()
    Sketches.hdrHistogram(vals(100000L), "v").count()

    for (n <- Seq(1000000L, 10000000L)) {
      t(s"cms_counters w=1024 d=4 n=$n") {
        Sketches.cmsCounters(toks(n), "tok", 1024, 4).count()
      }
      t(s"hdr_histogram n=$n") {
        Sketches.hdrHistogram(vals(n), "v").count()
      }
      t(s"kmv_distinct k=256 n=$n") {
        Sketches.kmvDistinct(vals(n), "v", 256).collect()
      }
      t(s"hll_distinct b=8 n=$n") {
        Sketches.hllDistinct(vals(n), "v", 8).collect()
      }
    }
    // CMS width axis: counters scale with width only in the final merge
    for (w <- Seq(256, 4096, 65536)) {
      t(s"cms_counters w=$w d=4 n=10000000") {
        Sketches.cmsCounters(toks(10000000L), "tok", w, 4).count()
      }
    }
    // quantile read on a 10M-value histogram stays sketch-sized
    val hist = Sketches.hdrHistogram(vals(10000000L), "v")
    t("hdr_quantiles read (5 qs, 10M-value hist)") {
      Sketches.hdrQuantiles(hist, Seq(0.25, 0.5, 0.75, 0.9, 0.99)).collect()
    }
    spark.stop()
  }
}
