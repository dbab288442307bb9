package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 probe (round-10 verdict task 3): incremental maintenance cost
  * of the standing BM25 postings index — [[ext.Search.addDocsToPostings]]
  * trickle appends vs a full rebuild, at an index size where the
  * difference matters.
  *
  * Postings rows are additive per (doc, term) and new docs are disjoint
  * from every existing row, so the append writes batch-sized data and
  * never reads the store: its cost must be flat in index size, while the
  * rebuild re-tokenizes and re-shuffles the whole corpus. The probe seeds
  * `nDocs` synthetic docs (100 terms each over a 50k-term shared
  * vocabulary, so df distributions are real), appends `nBatches` batches
  * of `batchDocs` docs, then times one full rebuild at the final corpus —
  * and gates on the appended store being row-identical to the rebuild,
  * with a PRF query answering identically from both. */
object ProbePostings {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(4)
    val batchDocs = args.lift(2).map(_.toLong).getOrElse(2000L)
    val base = java.nio.file.Files.createTempDirectory("graft_postings_probe").toString

    // 100 terms/doc over a shared 50k vocabulary; term mix varies by doc
    def docsFor(lo: Long, hi: Long): DataFrame =
      spark.range(lo, hi).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(99)),
          k => concat(lit("t"), pmod(col("id") * 37 + k * 101, lit(50000))))).as("text"))

    println(s"== seeding index with $nDocs docs ==")
    ProbeUtil.time("seed build (append into empty)") {
      ext.Search.addDocsToPostings(docsFor(0L, nDocs), s"$base/idx")
    }

    println(s"== $nBatches append batches of $batchDocs docs ==")
    (0 until nBatches).foreach { b =>
      val lo = nDocs + b * batchDocs
      ProbeUtil.time(f"append batch $b%2d") {
        ext.Search.addDocsToPostings(docsFor(lo, lo + batchDocs), s"$base/idx")
      }
    }

    val finalHi = nDocs + nBatches * batchDocs
    ProbeUtil.time("full rebuild at final size") {
      ext.Search.addDocsToPostings(docsFor(0L, finalHi), s"$base/rebuild")
    }

    // stats recovery over the appended store (the read path every query pays)
    ProbeUtil.time("stats recovery (appended)") {
      ext.Search.bm25StatsFromPostings(spark.read.parquet(s"$base/idx")).collect()
    }

    // equality gate: appended store ≡ one-shot rebuild, row for row
    val a = spark.read.parquet(s"$base/idx")
    val r = spark.read.parquet(s"$base/rebuild")
    val diff = a.join(r.withColumnRenamed("tf", "tf_r").withColumnRenamed("dl", "dl_r"),
        Seq("doc_id", "term"), "full_outer")
      .filter(!(col("tf") <=> col("tf_r")) || !(col("dl") <=> col("dl_r"))).count()
    println(s"store divergence rows: $diff (rows: ${a.count()})")
    require(diff == 0L, "appended store must equal the one-shot rebuild")

    // query gate: PRF answers identically from both stores
    val q = Seq("t17", "t4242")
    val fromA = ext.Search.prfTopKFromPostings(a,
      ext.Search.bm25StatsFromPostings(a), q, k = 10).collect().map(_.toString).toSeq
    val fromR = ext.Search.prfTopKFromPostings(r,
      ext.Search.bm25StatsFromPostings(r), q, k = 10).collect().map(_.toString).toSeq
    require(fromA == fromR, s"query divergence: $fromA vs $fromR")
    println("query parity: OK")

    // Round-12 section (verdict task 6): the stats-driven maintenance
    // loop — append until postingsStats recommends compaction, fire
    // compactPostings, and show the term-probe read cost dropping back
    // (append fans each term's postings across one file per batch; the
    // compacted store is one term-clustered file per hash bucket).
    println("== append -> threshold -> compact -> flat reads ==")
    def probeRead(label: String): Unit = ProbeUtil.time(label) {
      ext.Search.prfTopKFromPostings(spark.read.parquet(s"$base/idx"),
        ext.Search.bm25StatsFromPostings(spark.read.parquet(s"$base/idx")),
        q, k = 10).collect()
    }
    def health(label: String): Boolean = {
      val st = ext.Search.postingsStats(spark, s"$base/idx").collect()(0)
      println(f"[$label] n_files=${st.getAs[Long]("n_files")} " +
        f"total_rows=${st.getAs[Long]("total_rows")} " +
        f"avg_rows_per_file=${st.getAs[Double]("avg_rows_per_file")}%.0f " +
        f"compact_recommended=${st.getAs[Boolean]("compact_recommended")}")
      st.getAs[Boolean]("compact_recommended")
    }
    probeRead("term probe before extra appends")
    var b = nBatches
    while (!health(s"after ${b} appends")) {
      val lo = nDocs + b * batchDocs
      ext.Search.addDocsToPostings(docsFor(lo, lo + batchDocs), s"$base/idx")
      b += 1
    }
    probeRead("term probe at threshold (fragmented)")
    ProbeUtil.time("compactPostings") {
      ext.Search.compactPostings(spark, s"$base/idx")
    }
    require(!health("after compaction"), "compaction must clear the flag")
    probeRead("term probe after compaction")

    graft.core.Fs.rmTree(base)
    spark.stop()
  }
}
