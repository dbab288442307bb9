package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Scale probe for the dedup chain (committed so it re-runs per round —
  * results in ARCHITECTURE.md): a 10× documents table (10 suffix-mutated
  * copies of the given SF's corpus, copy k appending k distinct tokens so
  * cross-copy Jaccard decays through the threshold), then
  * minhash → banded LSH → exact-Jaccard verify → connected components →
  * dropNearDuplicates, timed per stage, with the union-find vs BSP
  * component paths cross-checked on the full vertex set.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.ProbeDedup [copies]
  * (default 10; round 7 also ran 50 — at 50 copies the cross-copy decay
  * keeps most copy-pairs above the 0.5 threshold, so clusters reach ~50
  * members and the edge count crosses the 1M union-find gate, exercising
  * the BSP default path at scale)
  */
object ProbeDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    // shift by max(id)+1, not count(): sparse ids would otherwise collide
    // across copies and violate the LSH unique-id precondition
    val n = base.agg(max("doc_id")).head().getLong(0) + 1L
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val big = (0 until copies).map { k =>
      base.select((col("doc_id") + lit(k * n)).as("doc_id"),
        concat_ws(" ", col("text"),
          lit((0 until k).map(j => s"mutslug${k}x$j").mkString(" "))).as("text"))
    }.reduce(_ union _).repartition(32).cache()
    println(s"probe corpus: ${big.count()} docs")

    import ProbeUtil.time

    val pairs = time("minhash+LSH+verify pairs (cold)") {
      val p = Dedup.minhashNearDuplicates(big, threshold = 0.5)
        .select("doc_a", "doc_b").cache()
      println(s"  edges: ${p.count()}")
      p
    }
    time("pairs (warm, re-executed)") {
      Dedup.minhashNearDuplicates(big, threshold = 0.5).count()
    }
    val uf = time("components via driver union-find (default gate)") {
      val c = Dedup.connectedComponents(pairs).cache(); c.count(); c
    }
    val bsp = time("components via forced BSP (collectThreshold=0)") {
      val c = Dedup.connectedComponents(pairs, collectThreshold = 0L).cache()
      c.count(); c
    }
    val disagree = uf.as("a")
      .join(bsp.as("b"), col("a.id") === col("b.id"))
      .filter(col("a.component") =!= col("b.component")).count()
    println(s"union-find vs BSP label disagreements: $disagree")
    time("dropNearDuplicates end-to-end") {
      println(s"  kept: ${Dedup.dropNearDuplicates(big, threshold = 0.5).count()} of ${big.count()}")
    }

    // streaming near-dedup processor at batch scale: batch 1 populates
    // the signature store from the whole 10x corpus; batch 2 re-sends
    // the corpus under shifted ids — the store must reject all of it.
    // Batch 2 is the steady-state shape (non-empty store join).
    val tmp = java.nio.file.Files.createTempDirectory("ndd_probe")
    time("streaming near-dedup: batch 1 (full corpus, empty store)") {
      graft.streaming.StreamOps.processNearDedupBatch(
        big, s"$tmp/sink", s"$tmp/state", "doc_id", "text", 3)
    }
    val admitted1 = spark.read.parquet(s"$tmp/sink").count()
    time("streaming near-dedup: batch 2 (full re-send vs populated store)") {
      graft.streaming.StreamOps.processNearDedupBatch(
        big.select((col("doc_id") + lit(copies.toLong * n)).as("doc_id"), col("text")),
        s"$tmp/sink", s"$tmp/state", "doc_id", "text", 3)
    }
    val admittedTotal = spark.read.parquet(s"$tmp/sink").count()
    println(s"  batch1 admitted $admitted1; batch2 leaked ${admittedTotal - admitted1}")
    spark.stop()
  }
}
