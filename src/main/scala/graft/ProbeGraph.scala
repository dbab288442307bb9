package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-9 graph/ordering operators (committed so it
  * re-runs per round — results in ARCHITECTURE.md):
  *
  *   - TextRank over a 10× suffix-mutated documents table: the edge
  *     build is the corpus-sized pass; iterations are vocab-sized — the
  *     probe separates the two;
  *   - label propagation over the 10× corpus's minhash near-dup graph
  *     (planted: every doc has 9 mutated twins) from a 10% seed slice;
  *   - globalOrdinal on ~600k lineitem rows vs the NAIVE single-
  *     partition global window on the same data — the operator's reason
  *     to exist, measured;
  *   - content-defined chunking over the 10× corpus;
  *   - nearest-centroid classification of the 10× embeddings table.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.ProbeGraph
  */
object ProbeGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import ProbeUtil.time

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"), col("lang"))
    val n = base.agg(max("doc_id")).head().getLong(0) + 1L
    val bigDocs = (0 until 10).map { k =>
      base.select((col("doc_id") + lit(k * n)).as("doc_id"),
        concat_ws(" ", col("text"),
          lit((0 until k).map(j => s"mutslug${k}x$j").mkString(" "))).as("text"),
        col("lang"))
    }.reduce(_ union _).repartition(32).cache()
    println(s"probe docs: ${bigDocs.count()}")

    // --- TextRank: edge build vs iterations ---
    val edges = time("textrank edge build (window=2, corpus pass)") {
      val e = graft.core.Ckpt.pin(
        graft.ext.TextRank.cooccurrenceEdges(bigDocs, window = 2)
          .withColumn("ratio", col("w") / col("out_w"))
          .select("src", "dst", "ratio"))
      println(s"  directed edges: ${e.count()}")
      e
    }
    time("textrank 4 iterations end-to-end (fresh, incl. edge build)") {
      println(s"  ranked terms: ${graft.ext.TextRank
        .textRankScores(bigDocs, window = 2, iters = 4).count()}")
    }
    edges.unpersist(false)

    // --- label propagation on the planted near-dup graph ---
    val pairs = time("minhash near-dup pair graph (the LP input)") {
      val p = graft.core.Ckpt.pin(graft.ext.Dedup.minhashNearDuplicates(
        bigDocs, threshold = 0.5).select("doc_a", "doc_b"))
      println(s"  pairs: ${p.count()}")
      p
    }
    // seed stride 7 is coprime to the 10x id offset (5000·k), so every
    // planted 10-twin cluster holds 1-2 seeds; a stride of 10 would give
    // each cluster all seeds or none (measured: only 460 propagated)
    time("label propagation, 3 rounds, ~14% seeds (stride 7)") {
      val seeds = bigDocs.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(7)) === 0, col("lang")).as("label"))
      val out = graft.ext.LabelProp.propagate(seeds, pairs, iters = 3)
      println(s"  labeled: ${out.count()} (origin mix: ${out.groupBy("origin")
        .count().collect().map(r => s"${r.get(0)}=${r.get(1)}").mkString(", ")})")
    }

    // --- global ordinal vs the naive single-partition window ---
    // both paths at 1x (~600k rows) AND 10x (~6M): the naive single-
    // partition window wins small (one task sort beats the extra
    // broadcast + shuffle), the two-phase rank is for the regime where
    // one task cannot hold the corpus — find the crossover
    val li1 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(concat_ws("_", col("l_orderkey"), col("l_linenumber")).as("rid"),
        col("l_extendedprice").cast("double").as("price"))
    for (copies <- Seq(1, 10)) {
      val li = (0 until copies).map { k =>
        li1.select(concat_ws("_", lit(k), col("rid")).as("rid"),
          (col("price") + lit(k * 0.001)).as("price"))
      }.reduce(_ union _).repartition(32).cache()
      println(s"probe lineitem rows (${copies}x): ${li.count()}")
      time(s"globalOrdinal two-phase (1024 buckets, ${copies}x)") {
        graft.ext.Sampling.globalOrdinal(li, "price", "rid")
          .agg(sum("ordinal")).head()
      }
      time(s"NAIVE global window row_number (single partition, ${copies}x)") {
        import org.apache.spark.sql.expressions.Window
        li.withColumn("ordinal",
            row_number().over(Window.orderBy(col("price"), col("rid"))))
          .agg(sum("ordinal")).head()
      }
      li.unpersist(false)
    }

    // --- content-defined chunking ---
    time("contentDefinedChunks (4-gram, divisor 64) over 10x docs") {
      val c = graft.ext.Packing.contentDefinedChunks(bigDocs)
        .agg(count(lit(1)), avg("n_tokens")).head()
      println(f"  chunks: ${c.getLong(0)}, avg tokens/chunk: ${c.getDouble(1)}%.1f")
    }

    // --- nearest-centroid classification at 10x embeddings ---
    val ebase = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"), col("label"))
    val en = ebase.agg(max("vec_id")).head().getLong(0) + 1L
    val bigEmb = (0 until 10).map { k =>
      ebase.select((col("vec_id") + lit(k * en)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ union _).repartition(32).cache()
    println(s"probe embeddings: ${bigEmb.count()}")
    time("nearest-centroid fit + classify (10 labels)") {
      val out = graft.ext.NearestCentroid.classify(bigEmb,
        graft.ext.NearestCentroid.labelCentroids(bigEmb))
      println(s"  classified: ${out.count()}")
    }

    spark.stop()
  }
}
