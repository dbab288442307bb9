package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plain-text corpus sources — the other common LLM interchange besides
  * JSONL: one document per LINE (web-crawl exports, sentence corpora) or
  * one document per FILE (book/article dumps). Compression is handled by
  * the datasource (a `.gz`/`.bz2` suffix decompresses transparently;
  * note gzip is NOT splittable — one task per .gz file, so at scale
  * prefer many medium files or a splittable codec).
  *
  * doc_id is CONTENT-ADDRESSED (xxhash64 of the line, or of the file
  * path for whole-file docs): a positional id (`monotonically_increasing
  * _id`, zipWithIndex) is not reproducible across re-reads with a
  * different partitioning, which silently breaks joins between runs.
  * Identical lines therefore collapse to one id — exactly what a dedup
  * pipeline wants; keep `source_file` for provenance.
  */
object TextCorpus {

  /** One document per non-blank line. */
  def readLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(
        xxhash64(col("value")).as("doc_id"),
        col("value").as("text"),
        input_file_name().as("source_file"))

  /** One document per file (`wholetext`). */
  def readFiles(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .select(
        xxhash64(input_file_name()).as("doc_id"),
        col("value").as("text"),
        input_file_name().as("source_file"))

  /** Line-corpus sink: one line per document, partitioned task-parallel
    * writes like every other sink here. THE line-format invariant: a
    * document must not contain newlines, or it round-trips as several
    * documents with different content-addressed ids. By default embedded
    * line breaks are folded to single spaces (`sanitizeNewlines = true`)
    * so write→read is doc-preserving; pass `false` to write raw ONLY
    * when the caller has proven the corpus newline-free (there is no
    * cheap write-time check — a validation would cost a full extra
    * pass). Null texts are dropped (a null line is unrepresentable). */
  def writeLines(df: DataFrame, path: String, textCol: String = "text",
      sanitizeNewlines: Boolean = true): Unit = {
    val raw = df.select(col(textCol).cast("string").as("value"))
      .filter(col("value").isNotNull)
    val out =
      if (sanitizeNewlines)
        raw.select(regexp_replace(col("value"), "[\\r\\n]+", " ").as("value"))
      else raw
    out.write.mode("overwrite").text(path)
  }
}
