package graft

import graft.ext.Pii

class PiiSpec extends SparkSpec {
  import spark.implicits._

  test("redact: emails, IPs, phones replaced with typed placeholders") {
    val df = Seq(
      (1L, "mail me at jane.doe+spam@sub.example.co.uk or call +44 201-5550"),
      (2L, "server 10.0.255.3 and backup 192.168.1.17 are down"),
      (3L, "no pii here, just 3.14 and version 2.0"),
      (4L, "a@b.io b@c.org +1 555-0100 +999 123-4567 8.8.8.8")
    ).toDF("doc_id", "text")
    val out = Pii.redactPii(df).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text") == "mail me at <EMAIL> or call <PHONE>")
    assert(out(0).getAs[Long]("n_email") == 1 && out(0).getAs[Long]("n_phone") == 1)
    assert(out(1).getAs[String]("text") == "server <IP> and backup <IP> are down")
    assert(out(1).getAs[Long]("n_ipv4") == 2)
    assert(out(2).getAs[String]("text") == "no pii here, just 3.14 and version 2.0")
    assert(Seq("n_email", "n_ipv4", "n_phone").forall(out(2).getAs[Long](_) == 0L))
    assert(out(3).getAs[String]("text") == "<EMAIL> <EMAIL> <PHONE> <PHONE> <IP>")
    assert(out(3).getAs[Long]("n_email") == 2 && out(3).getAs[Long]("n_phone") == 2
      && out(3).getAs[Long]("n_ipv4") == 1)
  }

  test("sequential counts: earlier rules consume, later rules never double count") {
    // the IP-shaped digits live INSIDE the email; email redacts first, so
    // n_ipv4 must be 0 (redactPii), while the independent piiStats counts both
    val df = Seq((1L, "ping admin@10.1.2.3.example.com now")).toDF("doc_id", "text")
    val seq = Pii.redactPii(df).head()
    assert(seq.getAs[Long]("n_email") == 1 && seq.getAs[Long]("n_ipv4") == 0)
    val ind = Pii.piiStats(df).head()
    assert(ind.getAs[Long]("n_email") == 1 && ind.getAs[Long]("n_ipv4") == 1)
  }

  test("idempotent: redacting twice equals redacting once") {
    val df = Seq((1L, "x a@b.io +1 555-0100 1.2.3.4 y")).toDF("doc_id", "text")
    val once = Pii.redactPii(df).select("doc_id", "text")
    val twice = Pii.redactPii(once).select("doc_id", "text")
    assert(once.collect().toSeq == twice.collect().toSeq)
  }

  test("stateless stream composability: redactPii on readStream equals the batch form") {
    import org.apache.spark.sql.types._
    val rows = Seq(
      (1L, "mail a@b.io from 10.0.0.1"),
      (2L, "call +1 555-0100 now"),
      (3L, null.asInstanceOf[String]))
    val dir = java.nio.file.Files.createTempDirectory("pii_stream").toString
    rows.toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val batch = Pii.redactPii(spark.read.parquet(dir))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(batch(1L) == "mail <EMAIL> from <IP>" && batch(2L) == "call <PHONE> now"
      && batch(3L) == null)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val q = Pii.redactPii(spark.readStream.schema(schema).parquet(dir))
      .writeStream.outputMode("append").format("memory")
      .queryName("pii_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("pii_out")
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
      assert(streamed == batch, s"stream $streamed vs batch $batch")
    } finally q.stop()
  }

  test("rule validation: duplicates and group-reference replacements throw") {
    val df = Seq((1L, "t")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Pii.redactPii(df, rules = Seq(
        Pii.Rule("a", "x", "<A>"), Pii.Rule("a", "y", "<B>")))
    }
    intercept[IllegalArgumentException] {
      Pii.redactPii(df, rules = Seq(Pii.Rule("a", "(x)", "$1")))
    }
  }
}
