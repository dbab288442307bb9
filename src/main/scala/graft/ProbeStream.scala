package graft

import org.apache.spark.sql.SparkSession

/** Round-7 probe (round-6 verdict task 5): per-batch cost curve of the
  * streaming near-dedup signature store
  * ([[streaming.StreamOps.processNearDedupBatch]]).
  *
  * The store is append-only parquet that grows one (doc_id, simhash) row
  * per admitted doc, and every micro-batch band-joins its own signatures
  * against ALL of it. The join is banded (bucket-local, never
  * all-pairs), so the per-batch cost should grow with store SIZE only
  * through the scan+shuffle of store signatures — linear with a small
  * constant — plus parquet file-listing overhead that grows with the
  * number of appended part-files. This probe drives 50 batches and
  * prints per-batch wall time, store rows, and store file count, so
  * "the curve bends" stops being a conjecture either way.
  *
  * Batch shape (2,000 docs each): 1,800 fresh unique-token docs
  * (admitted), 100 in-batch exact copies (within-batch losers), 100
  * copies of the previous batch's fresh docs (store near-dups). Expected
  * admissions: 1,800/batch steady state, verified against the sink. */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val nBatches = args.headOption.map(_.toInt).getOrElse(50)
    // round 8: "banded" second arg drives the band-bucketed compacting
    // store instead of the default append-only layout
    val banded = args.lift(1).contains("banded")
    // round 9 (crossover measurement): third arg pre-seeds the store
    // with N synthetic signatures IN THE LAYOUT UNDER TEST before the
    // batch loop, so per-batch cost is measured against a store orders
    // of magnitude past what 50 live batches build (90k) — the regime
    // the r8 probe could only argue about. Seed ids are negative
    // (disjoint from batch ids); seed hashes are xxhash64(id) — uniform
    // 64-bit, so accidental Hamming-≤3 store hits are ~1e-10/doc and
    // the 1,800-admissions-per-batch expectation still holds.
    val preSeed = args.lift(2).map(_.toLong).getOrElse(0L)
    val compactEvery = 16
    val base = java.nio.file.Files.createTempDirectory("graft_stream_probe").toString
    val sinkDir = s"$base/sink"
    val stateDir = s"$base/state"

    if (preSeed > 0) {
      import org.apache.spark.sql.functions._
      val seeds = spark.range(preSeed)
        .select((-col("id") - 1).as("doc_id"), xxhash64(col("id")).as("simhash"))
      if (banded)
        graft.ext.Dedup.simhashBands(seeds)
          .withColumn("bg", pmod(col("bucket"),
            lit(streaming.StreamOps.StoreBucketGroups.toLong)).cast("int"))
          .repartition(col("band"), col("bg"))
          .write.mode("overwrite").partitionBy("band", "bg").parquet(stateDir)
      else seeds.write.mode("overwrite").parquet(stateDir)
      println(s"pre-seeded $preSeed signatures (${if (banded) "banded" else "default"} layout)")
    }

    def freshDocs(b: Int): Seq[(Long, String)] =
      (0 until 1800).map { i =>
        (b * 10000L + i, (0 until 20).map(j => s"t${b}_${i}_$j").mkString(" "))
      }

    def batchDf(b: Int) = {
      val fresh = freshDocs(b)
      val inBatchDups = (0 until 100).map { i =>
        (b * 10000L + 5000 + i, fresh(i)._2) // same text, higher id -> loser
      }
      val prior = if (b == 0) Seq.empty else freshDocs(b - 1).take(100)
        .zipWithIndex.map { case ((_, t), i) => (b * 10000L + 6000 + i, t) }
      (fresh ++ inBatchDups ++ prior).toDF("doc_id", "text")
    }

    println(f"${"batch"}%5s ${"sec"}%7s ${"store_rows"}%10s ${"store_files"}%11s")
    val times = (0 until nBatches).map { b =>
      val df = batchDf(b)
      val t0 = System.nanoTime()
      streaming.StreamOps.processNearDedupBatch(df, sinkDir, stateDir, "doc_id", "text", 3,
        bandedStore = banded, compactEvery = compactEvery, batchId = b.toLong)
      val sec = (System.nanoTime() - t0) / 1e9
      val rows =
        if (banded) spark.read.parquet(stateDir).select("doc_id").distinct().count()
        else spark.read.parquet(stateDir).count()
      val files = {
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(stateDir))
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala.count(_.toString.endsWith(".parquet"))
        } finally walk.close()
      }
      println(f"$b%5d $sec%7.2f $rows%10d $files%11d")
      sec
    }
    val admitted = spark.read.parquet(sinkDir).count()
    // every batch admits exactly its 1,800 fresh docs: in-batch copies
    // lose to their same-batch twins, prior copies drop against the store
    val expect = nBatches * 1800L
    println(s"sink rows: $admitted (expect $expect)")
    // non-overlapping head/tail windows, sized to the run (batch 0 is cold
    // and excluded); guards the ratio against small nBatches
    val w = math.max(1, math.min(10, (times.length - 1) / 2))
    val head = times.slice(1, 1 + w)
    val tail = times.takeRight(w)
    val (ha, ta) = (head.sum / head.length, tail.sum / tail.length)
    println(f"avg batch sec: first$w=$ha%.2f last$w=$ta%.2f ratio=${ta / ha}%.2f")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }
}
