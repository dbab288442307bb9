package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Readers for the driver's parquet tables (TESTDATA.md / FIXTURES.md §B).
  *
  * All engine queries read from a scale-factor directory containing one
  * parquet file per table. Column pruning and predicate pushdown reach the
  * scan because every downstream operator is declared with the DataFrame API.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) which Spark's vectorized reader rejects;
    // read nanos as long and normalize below (session conf, safe to set here).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Driver fixtures write naive timestamp[us] (isAdjustedToUTC=false); by
    // default Spark 4 infers TIMESTAMP_NTZ for those, which breaks
    // unix_micros/window arithmetic downstream and diverges from the LTZ
    // semantics every oracle was validated under. Reading them as session-TZ
    // timestamps (UTC) at the SCAN level — rather than cast()ing after — keeps
    // ts predicates eligible for parquet pushdown.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // With NTZ inference off, naive timestamp[us] values are interpreted in
    // the SESSION time zone. Every oracle was validated under UTC, so pin it
    // here rather than relying on each entry point (Bench/Verify/tests) to
    // remember — otherwise a caller inheriting the JVM TZ gets silently
    // shifted ts values.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Normalize any nanosecond-epoch long `ts` back to a proper timestamp.
    // Integer division keeps full microsecond precision (double would not).
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** CSV source — the reference's user workflows load CSVs into the study
    * (reference README.md:129-135); this is the engine-side equivalent.
    * Pass an explicit `schema` in anything production-sized: schema
    * inference costs a FULL extra pass over the files before the real scan
    * (at 100 TB that is a second 100 TB read), so the inference fallback
    * here is a convenience for notebooks and fixtures only. With an
    * explicit schema the read is single-pass and column pruning /
    * predicate pushdown plan as usual. */
  def readCsv(spark: SparkSession, path: String,
      schema: Option[StructType] = None,
      header: Boolean = true,
      delimiter: String = ","): DataFrame = {
    val r = spark.read.option("header", header.toString).option("sep", delimiter)
    schema match {
      case Some(s) => r.schema(s).csv(path)
      case None => r.option("inferSchema", "true").csv(path)
    }
  }

  /** CSV sink (S2 twin of the parquet sink): header'd directory write.
    * Partitioned output — each task writes its own part file; coalesce
    * first only if a single file is genuinely required (it serializes the
    * write). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.option("header", "true").mode("overwrite").csv(path)

  /** ORC source/sink — the other columnar format warehouses exchange.
    * Same planner properties as parquet (columnar scan, predicate
    * pushdown, column pruning, self-describing schema), so no schema
    * argument is needed; prefer parquet for new data, read ORC where it
    * already exists. (Avro is NOT offered: the spark-avro datasource is
    * an external module absent from this classpath.) */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
