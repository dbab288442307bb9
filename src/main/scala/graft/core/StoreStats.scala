package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pure-METADATA health read-out for the append-mode parquet stores
  * (BM25 postings, the banded near-dup store, the partitioned term-count
  * store): trickle appends accumulate small files, compaction exists,
  * but FIRING it was operator judgment with nothing to judge from. This
  * read-out closes the maintenance loop — file count and bytes from the
  * filesystem listing, row counts from the parquet FOOTERS; no data scan
  * anywhere, cost ∝ file count (exactly the quantity being monitored,
  * so the probe is cheapest when it matters most and still trivial when
  * the store has degraded to thousands of files).
  *
  * Policy lives at the call sites ([[graft.ext.Search.postingsStats]],
  * [[graft.streaming.StreamOps.nearDupStoreStats]]): they add a
  * `compact_recommended` flag against a file-count threshold, because
  * small-file pain is listing- and footer-count-bound long before it is
  * byte-bound. */
object StoreStats {

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** One row: (n_files, total_rows, total_bytes, avg_rows_per_file,
    * avg_bytes_per_file). Hidden/marker entries (`_SUCCESS`,
    * `_graft_buckets`, dot-files) are skipped like parquet readers skip
    * them; partition directories are recursed. Zero data files → one
    * all-zero row (an empty store is healthy, not an error). */
  def parquetStoreStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    val files = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.hadoop.fs.LocatedFileStatus]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith("."))
        files += f
    }
    val nFiles = files.size.toLong
    val totalBytes = files.map(_.getLen).sum
    val totalRows = files.map { f =>
      scala.util.Using.resource(
        ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf)))(
        _.getRecordCount)
    }.sum
    import spark.implicits._
    Seq((nFiles, totalRows, totalBytes,
      if (nFiles > 0) r6(totalRows.toDouble / nFiles) else 0.0,
      if (nFiles > 0) r6(totalBytes.toDouble / nFiles) else 0.0))
      .toDF("n_files", "total_rows", "total_bytes",
        "avg_rows_per_file", "avg_bytes_per_file")
  }
}
