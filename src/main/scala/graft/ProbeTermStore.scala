package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 probe (round-9 verdict task 6): per-batch fold cost of the
  * two term-count store layouts at open-vocabulary scale.
  *
  * The DEFAULT layout ([[streaming.StreamOps.termCountUpdateBatch]])
  * collects the whole merged vocabulary to the driver and rewrites one
  * file per batch — per-batch cost grows with STORE size and the driver
  * materializes the full vocabulary every fold. The PARTITIONED layout
  * ([[streaming.StreamOps.termCountUpsertBatch]]) keeps the merge
  * distributed (bucket-pruned read, full-outer merge, dynamic partition
  * overwrite of touched buckets only) — nothing driver-resident, so it is
  * the layout that survives a vocabulary past driver memory.
  *
  * This probe seeds each layout with `vocab` synthetic terms (default
  * 1.2M — past the [[graft.ext.Bpe]] 2M-entry "dictionary-scale" gate
  * class boundary the default layout is documented for), then folds
  * `nBatches` identical update batches (10k fresh terms + 10k existing-
  * term increments each, 100 terms/doc) into both stores, timing every
  * fold. Batches of this vocabulary touch ~all hash buckets, so the
  * partitioned layout's win here must come from staying distributed
  * (no 1M-row driver collect, no single-task rewrite), not from bucket
  * pruning — pruning is the TRICKLE-batch win, measured separately by a
  * final 1-term fold into each layout. */
object ProbeTermStore {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vocab = args.headOption.map(_.toLong).getOrElse(1200000L)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(5)
    val termsPerDoc = 100L
    val base = java.nio.file.Files.createTempDirectory("graft_termstore_probe").toString

    // docs covering term ids [lo, hi): 100 terms per doc row
    def docsFor(lo: Long, hi: Long): DataFrame =
      spark.range(lo / termsPerDoc, (hi + termsPerDoc - 1) / termsPerDoc)
        .select(col("id").as("doc_id"),
          concat_ws(" ", transform(
            sequence(col("id") * termsPerDoc,
              least(col("id") * termsPerDoc + termsPerDoc - 1, lit(hi - 1))),
            i => concat(lit("t"), i))).as("text"))

    val seed = docsFor(0L, vocab)
    // batch b: 10k fresh terms above the seeded vocab + 10k existing
    def batchFor(b: Int): DataFrame =
      docsFor(vocab + b * 10000L, vocab + (b + 1) * 10000L)
        .unionByName(docsFor((b % 10) * 10000L, (b % 10 + 1) * 10000L)
          .withColumn("doc_id", col("doc_id") + 1000000000L))

    println(s"== seeding both layouts with $vocab terms ==")
    ProbeUtil.time("seed default (collect+rewrite)") {
      streaming.StreamOps.termCountUpdateBatch(seed, "text", s"$base/default")
    }
    ProbeUtil.time("seed partitioned (upsert)") {
      streaming.StreamOps.termCountUpsertBatch(seed, "text", s"$base/part", numBuckets = 32)
    }

    println(s"== folding $nBatches 20k-term batches into each ==")
    (0 until nBatches).foreach { b =>
      val batch = batchFor(b)
      ProbeUtil.time(f"batch $b%2d default    ") {
        streaming.StreamOps.termCountUpdateBatch(batch, "text", s"$base/default")
      }
      ProbeUtil.time(f"batch $b%2d partitioned") {
        streaming.StreamOps.termCountUpsertBatch(batch, "text", s"$base/part", numBuckets = 32)
      }
    }

    println("== trickle fold: one 1-term doc (bucket pruning regime) ==")
    import spark.implicits._
    val trickle = Seq((2000000000L, "t0")).toDF("doc_id", "text")
    ProbeUtil.time("trickle default    ") {
      streaming.StreamOps.termCountUpdateBatch(trickle, "text", s"$base/default")
    }
    ProbeUtil.time("trickle partitioned") {
      streaming.StreamOps.termCountUpsertBatch(trickle, "text", s"$base/part", numBuckets = 32)
    }

    // equality gate: the two layouts must hold the identical counts
    val d = spark.read.parquet(s"$base/default")
      .select(col("term"), col("cnt").cast("long").as("cnt"))
    val p = streaming.StreamOps.readTermCountStore(spark, s"$base/part")
    val diff = d.join(p.withColumnRenamed("cnt", "cnt_p"), Seq("term"), "full_outer")
      .filter(!(col("cnt") <=> col("cnt_p"))).count()
    println(s"layout divergence rows: $diff (store rows: ${p.count()})")
    require(diff == 0L, "layouts must agree bit-exactly")

    graft.core.Fs.rmTree(base)
    spark.stop()
  }
}
