package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Negatives

/** Scale probe for hard-negative mining (round 9 — the 50× embedding
  * ledger discipline): the ProbeIvf perturbed-copy corpus WITH labels,
  * timing (a) the batch-anchor broadcast path (10 anchors vs N — the
  * training-batch shape, whose shuffle is k·P rows by TopKAgg map-side
  * combine) and (b) the corpus-wide celled path at nlist ∝ √N (every
  * row an anchor — candidate pairs bounded by nprobe · N · N/nlist,
  * never N²). Corpus-wide brute is N²·A and deliberately NOT run;
  * celled recall is sampled on the 10 probe anchors against their
  * broadcast-brute gold.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.ProbeNegatives [copies] [nprobe]
  */
object ProbeNegatives {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = if (args.length > 0) args(0).toInt else 50
    val nprobe = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import ProbeUtil.time

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"), col("label"))
    val n = base.agg(max("vec_id")).head().getLong(0) + 1L
    val big = (0 until copies).map { k =>
      base.select((col("vec_id") + lit(k * n)).as("vec_id"),
        transform(col("embedding"), v => v + lit(k * 1e-3)).as("embedding"),
        col("label"))
    }.reduce(_ union _).repartition(32).cache()
    val total = big.count()
    val nlist = math.max(32, math.round(math.sqrt(total.toDouble)).toInt)
    println(s"probe table: $total labeled vectors, nlist=$nlist nprobe=$nprobe")

    val anchors = base.filter(col("vec_id") < 10).cache()
    anchors.count()

    val brute = time("batch-anchor brute mining (10 anchors, cold)") {
      val d = Negatives.hardNegatives(big, anchors, k = 5).cache(); d.count(); d
    }
    time("batch-anchor brute mining (warm)") {
      Negatives.hardNegatives(big, anchors, k = 5).count()
    }
    time("semi-hard band mining (warm-ish)") {
      Negatives.hardNegatives(big, anchors, k = 5, marginBand = Some(0.1)).count()
    }

    val celled = time(s"corpus-wide celled mining (every row an anchor, cold)") {
      val d = Negatives.hardNegativesCelled(big, k = 5, nlist = nlist, nprobe = nprobe)
        .cache()
      println(s"  celled rows: ${d.count()}")
      d
    }
    // sampled recall on the 10 probe anchors (corpus-wide brute is N²·A)
    val gold = brute.select(col("query_id"), col("vec_id"))
    val got = celled.filter(col("query_id") < 10).select(col("query_id"), col("vec_id"))
    val nq = gold.select("query_id").distinct().count()
    val hits = gold.join(got, Seq("query_id", "vec_id")).count()
    println(f"celled recall@5 vs brute on the 10 probe anchors: ${hits.toDouble / (nq * 5)}%.3f")
    val t0c = System.nanoTime()
    Negatives.hardNegativesCelled(big, k = 5, nlist = nlist, nprobe = nprobe)
      .write.mode("overwrite").format("noop").save()
    val celledSec = (System.nanoTime() - t0c) / 1e9
    println(f"corpus-wide celled mining (warm, for the crossover number): $celledSec%.2f s")

    // ---- round-11: multi-epoch epoch-batch read-out -----------------------
    // The training-loop claim made measured (round-10 verdict task 7):
    // B batches × 2 epochs through hardNegativesEpochBatch, each timed to
    // the noop sink (count would prune the mining joins). Per-call cost
    // must be FLAT across batches and epochs — each call pays one O(N)
    // two-phase ordinal rank plus one broadcast mine over batchSize
    // anchors, independent of how many batches were consumed before it —
    // so mining cost scales with data consumed, not data held. The
    // crossover vs the celled alternative: celled mines ALL N anchors in
    // one shot, so epoch-batch wins while (anchors actually consumed)
    // × per-batch-sec < celled-sec, i.e. for training runs that do not
    // sweep the full corpus each epoch (curriculum subsets, early stops),
    // and loses past it.
    println("---- multi-epoch epoch-batch mining ----")
    val batchSize = 2048
    val times = for (epoch <- 0 until 2; b <- 0 until 4) yield {
      val t0 = System.nanoTime()
      Negatives.hardNegativesEpochBatch(big, batchSize, b.toLong, epoch, k = 5)
        .write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"epoch $epoch batch $b ($batchSize anchors): $sec%.2f s")
      sec
    }
    val steady = times.drop(2).sum / times.drop(2).size
    val callsPerEpoch = math.ceil(total.toDouble / batchSize).toLong
    println(f"steady-state per-batch: $steady%.2f s (min-of-warm " +
      f"${times.drop(2).min}%.2f); full-corpus epoch = $callsPerEpoch calls " +
      f"~ ${steady * callsPerEpoch}%.0f s vs celled one-shot $celledSec%.2f s " +
      f"=> epoch-batch wins below ~${(celledSec / steady * batchSize).toLong} " +
      "anchors consumed per epoch")
    spark.stop()
  }
}
