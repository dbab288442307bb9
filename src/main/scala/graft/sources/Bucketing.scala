package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table support (SURVEY §7.4 scale path): co-locate rows by a
  * join/aggregation key at WRITE time so every later equi-join or
  * aggregation keyed on it plans with zero shuffle.
  *
  * Bucketing metadata lives in the session catalog (it is a table
  * property, not a parquet property), so this goes through
  * `saveAsTable`/`spark.table`, not path reads. Two tables bucketed on
  * the same key with the SAME bucket count sort-merge join with no
  * exchange on either side; a `groupBy(bucketCol)` similarly reuses the
  * bucket partitioning. On a real cluster the bucket count is chosen
  * once per table (≈ total cores, or data-size/target-partition-size)
  * and amortized over every downstream query — the classic trade of one
  * shuffle at ingest for none at query time. */
object Bucketing {

  /** Write `df` as a bucketed managed parquet table, optionally
    * sort-ordered within buckets (sorted buckets let the sort-merge join
    * skip its per-task sort too). Overwrites any existing table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Hive-style partitioned layout — the OTHER write-time co-location
    * axis: one directory per distinct partition-column tuple, so a read
    * filtered on those columns prunes whole directories at PLANNING time
    * (the scan's `PartitionFilters`; no footer is even opened for pruned
    * partitions). Partition by LOW-cardinality selective columns
    * (language, date, source); high-cardinality keys belong in
    * [[writeBucketed]] — a million tiny directories is the classic
    * small-files failure. The 100 TB corpus layout composes both:
    * `partitionBy(lang, dt)` directories, bucketed by doc id within.
    * ScaleSpec pins the pruning plan (non-empty PartitionFilters AND
    * pruned file count). */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }
}
