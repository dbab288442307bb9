package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** Newline-delimited JSON (JSONL) source/sink — the interchange format of
  * LLM corpus pipelines (one document object per line, splittable when
  * uncompressed or zstd-framed, streamable).
  *
  * The reader takes an EXPLICIT schema: schema inference on JSON is a
  * full extra pass over the data — at corpus scale that doubles ingest
  * cost, and inferred types drift with the sample. Malformed lines are a
  * fact of life in web-scale corpora, so the corrupt-record policy is a
  * first-class argument rather than a buried option. */
object Jsonl {

  /** Read JSONL at `path` with `schema`.
    *
    * `mode`:
    *  - `PERMISSIVE` (default): malformed lines yield null fields and the
    *    raw line is captured in `corruptCol` (added to the read schema —
    *    drop it after triage). NOTE (Spark restriction): a query that
    *    selects ONLY `corruptCol` raises AnalysisException; select at
    *    least one data column alongside it, or cache first.
    *  - `DROPMALFORMED`: malformed lines are silently dropped.
    *  - `FAILFAST`: the first malformed line fails the read.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
      mode: String = "PERMISSIVE",
      corruptCol: String = "_corrupt_record"): DataFrame = {
    val allowed = Set("PERMISSIVE", "DROPMALFORMED", "FAILFAST")
    require(allowed.contains(mode.toUpperCase(java.util.Locale.ROOT)),
      s"mode must be one of $allowed, got '$mode'")
    val withCorrupt =
      if (mode.equalsIgnoreCase("PERMISSIVE") && !schema.fieldNames.contains(corruptCol))
        schema.add(corruptCol, StringType)
      else schema
    spark.read
      .schema(withCorrupt)
      .option("mode", mode.toUpperCase(java.util.Locale.ROOT))
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }

  /** Write one JSON object per line. Default compression gzip — at corpus
    * scale prefer many medium files over few huge ones (gzip parts are
    * not splittable; parallelism = file count), so repartition upstream
    * to the part-count you want. */
  def write(df: DataFrame, path: String, compression: String = "gzip"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)
}
