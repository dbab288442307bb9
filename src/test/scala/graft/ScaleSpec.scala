package graft

import org.apache.spark.sql.functions._
import graft.ext.Skew
import graft.sources.Bucketing

/** Scale toolkit: salted-join equivalence + bucketed-table co-location. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  private def withNoBroadcast[A](body: => A): A = {
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqeBcast = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try body finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      aqeBcast match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("saltedJoin equals the plain inner join, including under hot-key skew") {
    // 10k rows of one hot key + a uniform tail, dim with extra + missing keys
    val left = ((1 to 10000).map(i => (1L, i.toDouble)) ++
      (1 to 500).map(i => ((i % 37 + 2).toLong, i.toDouble))).toDF("k", "v")
    val right = (1L to 30L).map(k => (k, s"dim$k")).toDF("k", "name")
    val salted = Skew.saltedJoin(left, right, "k", saltFactor = 4)
      .select("k", "v", "name")
    val plain = left.join(right, Seq("k")).select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin spreads a hot key across saltFactor shuffle keys") {
    val left = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val right = Seq((1L, "hot")).toDF("k", "name")
    val joined = Skew.saltedJoin(left, right, "k", saltFactor = 8)
    // the join runs on (k, __salt): every salt value must actually occur
    val salts = left
      .withColumn("s", pmod(xxhash64(struct(col("k"), col("v"))), lit(8L)))
      .select("s").distinct().count()
    assert(salts == 8, s"expected all 8 salts used, got $salts")
    assert(joined.count() == 1000)
  }

  test("saltFactor=1 degenerates to the plain join; bad args throw") {
    val left = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val right = Seq((1L, "a")).toDF("k", "name")
    assert(Skew.saltedJoin(left, right, "k", saltFactor = 1).count() == 1)
    intercept[IllegalArgumentException](Skew.saltedJoin(left, right, "k", 0))
    intercept[IllegalArgumentException](Skew.saltedJoin(left, right, "nope"))
  }

  test("bucketed tables sort-merge join with zero shuffle exchanges") {
    withNoBroadcast {
      val facts = (1L to 2000L).map(i => (i % 100, i.toDouble)).toDF("k", "v")
      val dims = (0L until 100L).map(k => (k, s"d$k")).toDF("k", "name")
      Bucketing.writeBucketed(facts, "graft_test_facts", "k", 4, Seq("k"))
      Bucketing.writeBucketed(dims, "graft_test_dims", "k", 4, Seq("k"))
      try {
        val j = spark.table("graft_test_facts")
          .join(spark.table("graft_test_dims"), Seq("k"))
        j.collect()
        val planStr = j.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        val shuffles = "Exchange hashpartitioning".r.findAllIn(planStr).length
        assert(shuffles == 0, s"expected 0 shuffles on bucketed join:\n$planStr")
        assert(j.count() == 2000)
        // bucket-aware aggregation also reuses the write-time partitioning
        val agg = spark.table("graft_test_facts").groupBy("k").agg(sum("v"))
        agg.collect()
        val aggPlan = agg.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        val aggShuffles = "Exchange hashpartitioning".r.findAllIn(aggPlan).length
        assert(aggShuffles == 0, s"expected 0 shuffles on bucketed agg:\n$aggPlan")
      } finally {
        spark.sql("DROP TABLE IF EXISTS graft_test_facts")
        spark.sql("DROP TABLE IF EXISTS graft_test_dims")
      }
    }
  }

  test("partitioned layout prunes directories at planning time") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val tmp = java.nio.file.Files.createTempDirectory("part_prune").toString
    try {
      val docs = (0L until 900L)
        .map(i => (i, Seq("en", "de", "fr")((i % 3).toInt), s"text $i"))
        .toDF("doc_id", "lang", "text")
      Bucketing.writePartitioned(docs, tmp, Seq("lang"))
      val read = spark.read.parquet(tmp).filter($"lang" === "en")
      read.collect()
      def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
        p.collectLeaves().collect { case s: FileSourceScanExec => s } ++
          p.subqueries.flatMap(scans)
      val scan = scans(read.queryExecution.executedPlan) match {
        case Seq(s) => s
        case other => fail(s"expected one scan, got $other")
      }
      // the lang predicate becomes a PARTITION filter (directory pruning),
      // not a data filter evaluated per row
      assert(scan.partitionFilters.nonEmpty, "lang filter was not pushed to partitions")
      // and only the matching directory's files are read
      assert(scan.inputRDDs().map(_.getNumPartitions).sum > 0)
      val files = scan.relation.location.listFiles(scan.partitionFilters, Nil)
        .flatMap(_.files).map(_.getPath.toString)
      assert(files.nonEmpty && files.forall(_.contains("lang=en")),
        s"pruned listing leaked other partitions: $files")
      assert(read.count() == 300)
      // control: unfiltered read sees all three partitions
      assert(spark.read.parquet(tmp).count() == 900)
    } finally {
      graft.core.Fs.rmTree(tmp)
    }
  }
}
