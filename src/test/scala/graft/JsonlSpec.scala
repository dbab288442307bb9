package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._
import org.apache.spark.SparkException
import graft.sources.Jsonl

class JsonlSpec extends SparkSpec {

  test("text corpus: line round-trip, content-addressed ids, gz transparent") {
    import spark.implicits._
    import graft.sources.TextCorpus
    val dir = java.nio.file.Files.createTempDirectory("txt_corpus").toString
    val docs = Seq("alpha doc one", "bravo doc two", "alpha doc one", "   ", "charlie three")
    TextCorpus.writeLines(docs.toDF("text"), s"$dir/lines")
    val back = TextCorpus.readLines(spark, s"$dir/lines")
    val texts = back.select("text").as[String].collect().sorted.toSeq
    // blank line dropped; duplicate line kept as rows but shares ONE id
    assert(texts == Seq("alpha doc one", "alpha doc one", "bravo doc two", "charlie three"), s"$texts")
    val idsByText = back.collect().groupBy(_.getAs[String]("text"))
      .view.mapValues(_.map(_.getAs[Long]("doc_id")).toSet).toMap
    assert(idsByText("alpha doc one").size == 1, "content-addressed id must collapse dups")
    assert(idsByText.values.flatten.toSet.size == 3, "distinct texts get distinct ids")
    // re-read with different partitioning: same ids (determinism)
    val again = TextCorpus.readLines(spark, s"$dir/lines").repartition(7)
      .select("doc_id").as[Long].collect().toSet
    assert(again == idsByText.values.flatten.toSet)
    // gzip: write one .gz file by hand, read transparently
    val gzDir = java.nio.file.Files.createDirectory(java.nio.file.Paths.get(dir, "gz"))
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(gzDir.resolve("part.txt.gz")))
    gz.write("gzipped line one\ngzipped line two\n".getBytes("UTF-8")); gz.close()
    val gzTexts = TextCorpus.readLines(spark, gzDir.toString)
      .select("text").as[String].collect().sorted.toSeq
    assert(gzTexts == Seq("gzipped line one", "gzipped line two"), s"$gzTexts")
    // whole-file mode: one doc per file, id from the path
    val wf = TextCorpus.readFiles(spark, gzDir.toString).collect()
    assert(wf.length == 1 && wf.head.getAs[String]("text").startsWith("gzipped line one"))
  }
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType)))

  /** docs jsonl dir with one malformed line appended to a part file. */
  private def writeFixture(corrupt: Boolean): String = {
    val dir = Files.createTempDirectory("jsonl").toString
    val docs = graft.core.Tables.documents(spark, SparkSpec.sf0001)
      .select("doc_id", "text", "lang")
    Jsonl.write(docs.coalesce(1), dir, compression = "none")
    if (corrupt) {
      val part = new java.io.File(dir).listFiles()
        .find(_.getName.endsWith(".json")).get
      Files.write(Paths.get(part.getPath),
        "{this is not json\n".getBytes, StandardOpenOption.APPEND)
      // the append invalidates Hadoop's .crc sidecars — remove them
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    }
    dir
  }

  test("csv source/sink round-trips with explicit schema, no inference pass") {
    val dir = Files.createTempDirectory("csvrt").toString
    val orig = graft.core.Tables.documents(spark, SparkSpec.sf0001)
      .select("doc_id", "lang", "n_chars")
    graft.core.Tables.writeCsv(orig, dir)
    val sch = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType)))
    val back = graft.core.Tables.readCsv(spark, dir, Some(sch))
    assert(back.schema == sch)
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig.select(col("doc_id"), col("lang"),
      col("n_chars").cast("long"))).isEmpty)
    // inference fallback agrees on the row count (convenience path)
    assert(graft.core.Tables.readCsv(spark, dir).count() == orig.count())
  }

  test("orc source/sink round-trips the documents table with pushdown intact") {
    val dir = Files.createTempDirectory("orcrt").toString
    val orig = graft.core.Tables.documents(spark, SparkSpec.sf0001)
    graft.core.Tables.writeOrc(orig, dir)
    val back = graft.core.Tables.readOrc(spark, dir)
    assert(back.schema == orig.schema)
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
    // predicate pushdown reaches the ORC scan like parquet
    val plan = back.filter(col("doc_id") < 10).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]") ||
      plan.contains("LessThan(doc_id,10)"), plan)
  }

  test("jsonl round-trips the documents table losslessly") {
    val dir = writeFixture(corrupt = false)
    val back = Jsonl.read(spark, dir, schema).drop("_corrupt_record")
    val orig = graft.core.Tables.documents(spark, SparkSpec.sf0001)
      .select("doc_id", "text", "lang")
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("permissive mode captures the malformed line in _corrupt_record") {
    val dir = writeFixture(corrupt = true)
    val df = Jsonl.read(spark, dir, schema).cache()
    try {
      val bad = df.filter(col("_corrupt_record").isNotNull)
        .select("_corrupt_record").as[String].collect()
      assert(bad.toSeq == Seq("{this is not json"))
      assert(df.filter(col("_corrupt_record").isNull).count() == df.count() - 1)
    } finally df.unpersist()
  }

  test("dropmalformed drops the bad line; failfast throws; bad mode rejected") {
    val dir = writeFixture(corrupt = true)
    val n = graft.core.Tables.documents(spark, SparkSpec.sf0001).count()
    assert(Jsonl.read(spark, dir, schema, mode = "DROPMALFORMED").count() == n)
    intercept[SparkException] {
      Jsonl.read(spark, dir, schema, mode = "FAILFAST").count()
    }
    intercept[IllegalArgumentException] {
      Jsonl.read(spark, dir, schema, mode = "WHATEVER")
    }
  }
}
