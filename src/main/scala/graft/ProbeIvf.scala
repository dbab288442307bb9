package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Scale probe for the IVF large-quantizer path (committed so the probe
  * is re-runnable per round — results in ARCHITECTURE.md):
  * a 10× embedding table (10 deterministically perturbed copies of the
  * given SF's embeddings) searched at a realistic coarse quantizer
  * (nlist ≥ 256 → the closure-UDF assignment/probe path), timed cold and
  * warm, with recall@10 against the brute-force baseline.
  *
  * Round 8 adds a `copies` arg so the table scales to 50× (100k+
  * vectors at sf0.1) with nlist ∝ √N — the embedding-side ledger now
  * matches the text-side dedup chain's 50× probes.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.ProbeIvf [nlist] [nprobe] [copies]
  */
object ProbeIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nlist = if (args.length > 0) args(0).toInt else 256
    val nprobe = if (args.length > 1) args(1).toInt else 16
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    // shift by max(id)+1, not count(): sparse ids would otherwise collide
    val n = base.agg(max("vec_id")).head().getLong(0) + 1L
    // perturbed copies: copy k shifts ids by k·n and adds k·1e-3 to
    // every component — distinct vectors, same cluster structure
    val big = (0 until copies).map { k =>
      base.select((col("vec_id") + lit(k * n)).as("vec_id"),
        transform(col("embedding"), v => v + lit(k * 1e-3)).as("embedding"))
    }.reduce(_ union _).repartition(32).cache()
    println(s"probe table: ${big.count()} vectors")

    val queries = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_emb")).cache()
    queries.count()

    import ProbeUtil.time

    val exact = time("brute (cold)") {
      val d = Similarity.bruteForceTopK(big, queries, k = 10); d.count(); d
    }
    time("brute (warm)") { Similarity.bruteForceTopK(big, queries, k = 10).count() }

    // quantized brute: at local scale this measures COMPUTE (the page
    // cache hides the 4x scan-byte win that matters on a real cluster) —
    // recorded to keep the claim honest either way
    val q8 = graft.ext.Quantize.quantizeEmbeddings(big).cache()
    time("quantize 10x table (once)") { q8.count() }
    time("quantized brute (cold)") {
      graft.ext.Quantize.quantizedTopK(q8, queries, 10).count()
    }
    time("quantized brute (warm)") {
      graft.ext.Quantize.quantizedTopK(q8, queries, 10).count()
    }
    q8.unpersist()

    val cents = time(s"ivf train nlist=$nlist (3 iters, stride-5 sample)") {
      Similarity.trainIvfCentroids(big, nlist = nlist, iters = 3, sampleMod = 5L)
    }
    def search(): DataFrame =
      Similarity.ivfTopKWithCentroids(big, queries, 10, cents, nprobe,
        "vec_id", "embedding", "query_id", "query_emb")
    val approx = time(s"ivf search nlist=$nlist nprobe=$nprobe (cold)") {
      val d = search(); d.count(); d
    }
    time("ivf search (warm)") { search().count() }
    time("ivf search (warm2)") { search().count() }

    // amortized-index path: assignment materialized once, search reuses it
    val assigned = Similarity.assignCells(big, cents).cache()
    time("assignCells (materialize once)") { assigned.count() }
    def searchPre(): DataFrame =
      Similarity.ivfTopKPreAssigned(assigned, queries, 10, cents, nprobe)
    time("ivf search pre-assigned (cold)") { searchPre().count() }
    time("ivf search pre-assigned (warm)") { searchPre().count() }

    val recall = Similarity.withRecallAtK(approx, exact)
      .select("query_id", "recall_at_k").distinct()
      .agg(avg("recall_at_k")).head().getDouble(0)
    println(f"recall@10 vs brute: $recall%.3f")

    // ---- hard mode: overlapping Gaussian mixture --------------------------
    // The perturbed-copy table's clusters are too separable to
    // differentiate recall; this corpus (100 centers, sigma comparable to
    // the center spacing, seeded) produces genuine neighbor ambiguity, so
    // the recall-vs-nprobe curve is informative.
    println("---- hard mode: 50k x 32-dim overlapping mixture ----")
    val rng = new scala.util.Random(42)
    val dim = 32; val nCenters = 100
    val centers = Array.fill(nCenters)(Array.fill(dim)(rng.nextGaussian()))
    val hardRows = (0L until 50000L).map { i =>
      val c = centers((i % nCenters).toInt)
      (i, c.map(_ + rng.nextGaussian() * 0.8).toSeq)
    }
    import spark.implicits._
    val hard = hardRows.toDF("vec_id", "embedding").repartition(32).cache()
    hard.count()
    val hq = hard.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_emb")).cache()
    hq.count()
    // cache the baseline and each approx result: withRecallAtK would
    // otherwise re-run the full brute pass per nprobe setting (and the
    // approx search a second time per iteration)
    val hardExact = time("hard brute") {
      val d = Similarity.bruteForceTopK(hard, hq, k = 10).cache(); d.count(); d
    }
    val hardCents = time(s"hard ivf train nlist=$nlist") {
      Similarity.trainIvfCentroids(hard, nlist = nlist, iters = 3, sampleMod = 5L)
    }
    Seq(1, 2, 4, 8, 16).foreach { np =>
      val approx = Similarity.ivfTopKWithCentroids(hard, hq, 10, hardCents, np,
        "vec_id", "embedding", "query_id", "query_emb").cache()
      val t0 = System.nanoTime()
      approx.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val r = Similarity.withRecallAtK(approx, hardExact)
        .select("query_id", "recall_at_k").distinct()
        .agg(avg("recall_at_k")).head().getDouble(0)
      println(f"hard nprobe=$np%2d: recall@10 $r%.3f, search $sec%.2f s")
      approx.unpersist()
    }

    // ---- round-10: persisted-index add-batch cost + recall drift ----------
    // Grow the index with vectors from centers the quantizer never saw
    // (center = id % 100; trained on centers 0-79, batches add 80-99 —
    // a genuine distribution shift), then compare the stale-centroid
    // grown index against a full retrain+rebuild for queries drawn from
    // the NEW distribution. Two honest numbers: seconds per add vs per
    // rebuild, and the recall the staleness costs. The corpus is the
    // hard mixture ×10 (500k rows): at 50k the rebuild is so cheap the
    // append cannot win — its floor is one parquet file per touched cell
    // (≈ nlist files/batch, the banded-store file-fan-out bound) while
    // the rebuild scales with N — so the crossover only shows at the
    // scale the API exists for.
    println("---- add-batch: index growth under distribution shift (500k rows) ----")
    val tmpIdx = java.nio.file.Files.createTempDirectory("ivf_addprobe").toString
    val bigHard = (0 until 10).map { c =>
      hard.select((col("vec_id") + lit(c * 50000L)).as("vec_id"),
        transform(col("embedding"), v => v + lit(c * 1e-3)).as("embedding"))
    }.reduce(_ union _).repartition(32).cache()
    println(s"add-batch corpus: ${bigHard.count()} vectors")
    val oldCorp = bigHard.filter(col("vec_id") % 100 < 80).cache(); oldCorp.count()
    val newCorp = bigHard.filter(col("vec_id") % 100 >= 80).cache(); newCorp.count()
    val oldCents = time("train on old distribution (400k rows)") {
      Similarity.trainIvfCentroids(oldCorp, nlist = nlist, iters = 3, sampleMod = 37L)
    }
    time("index create (400k rows)") {
      Similarity.ivfIndexCreate(oldCorp, oldCents, s"$tmpIdx/grown")
    }
    (0 until 4).foreach { b =>
      time(s"add batch $b (~12.5k new-distribution rows)") {
        Similarity.ivfIndexAddBatch(
          newCorp.filter(col("vec_id") % 8 === b), oldCents, s"$tmpIdx/grown")
      }
    }
    time("add remaining new rows (~50k, one batch)") {
      Similarity.ivfIndexAddBatch(
        newCorp.filter(col("vec_id") % 8 >= 4), oldCents, s"$tmpIdx/grown")
    }
    val nq = bigHard.filter(col("vec_id") >= 80 && col("vec_id") < 90)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_emb")).cache()
    nq.count()
    val unionBrute = Similarity.bruteForceTopK(bigHard, nq, 10).cache(); unionBrute.count()
    def recallOf(approx: DataFrame): Double =
      Similarity.withRecallAtK(approx, unionBrute)
        .select("query_id", "recall_at_k").distinct()
        .agg(avg("recall_at_k")).head().getDouble(0)
    val grownRecall = recallOf(Similarity.ivfTopKPreAssigned(
      spark.read.parquet(s"$tmpIdx/grown"), nq, 10, oldCents, nprobe))
    val freshCents = time("full retrain (500k rows)") {
      Similarity.trainIvfCentroids(bigHard, nlist = nlist, iters = 3, sampleMod = 37L)
    }
    time("full rebuild (500k rows)") {
      Similarity.ivfIndexCreate(bigHard, freshCents, s"$tmpIdx/rebuilt")
    }
    val rebuiltRecall = recallOf(Similarity.ivfTopKPreAssigned(
      spark.read.parquet(s"$tmpIdx/rebuilt"), nq, 10, freshCents, nprobe))
    println(f"new-distribution recall@10: grown (stale centroids) $grownRecall%.3f" +
      f" vs retrained rebuild $rebuiltRecall%.3f")
    graft.core.Fs.rmTree(tmpIdx)
    spark.stop()
  }
}
