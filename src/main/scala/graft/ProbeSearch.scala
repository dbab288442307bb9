package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Search, SemDedup, Similarity}

/** Scale probe for the round-5 retrieval/span-dedup operators (committed
  * so it re-runs per round — results in ARCHITECTURE.md):
  *
  *   - BM25 over a 10× suffix-mutated documents table (4-term and
  *     40-term queries — the shuffled hit volume scales with query
  *     size, the corpus scan does not);
  *   - SemDeDup over a 10× duplicated embeddings table (every vector ×10
  *     exact copies): pairs + end-to-end dedup, which must return ~N/10
  *     survivors — a planted 90%-redundant corpus;
  *   - C4 span dedup over the 10× mutated documents (cross-copy spans
  *     repeat massively; the winner agg and semi-join are the skew path
  *     under test).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.ProbeSearch
  */
object ProbeSearch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import ProbeUtil.time

    // --- 10x documents (the ProbeDedup recipe: suffix-mutated copies) ---
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val n = base.agg(max("doc_id")).head().getLong(0) + 1L
    val bigDocs = (0 until 10).map { k =>
      base.select((col("doc_id") + lit(k * n)).as("doc_id"),
        concat_ws(" ", col("text"),
          lit((0 until k).map(j => s"mutslug${k}x$j").mkString(" "))).as("text"))
    }.reduce(_ union _).repartition(32).cache()
    println(s"probe docs: ${bigDocs.count()}")

    val q4 = Seq("spark", "vector", "merge", "stream")
    time("bm25 top-25, 4-term query (cold)") {
      println(s"  rows: ${Search.bm25TopK(bigDocs, q4, k = 25).count()}")
    }
    time("bm25 top-25, 4-term query (warm)") {
      Search.bm25TopK(bigDocs, q4, k = 25).count()
    }
    // 40-term query: every distinct fixture token ~= worst case (the
    // term filter passes nearly the whole token stream to the shuffle)
    val q40 = Seq("spark", "vector", "merge", "stream", "table", "scan", "slow",
      "fast", "key", "agg", "row", "value", "part", "hash", "batch", "line",
      "sort", "window", "the", "a", "big", "small", "data", "column", "join",
      "customer", "query", "order", "group", "filter", "stream2", "x1", "x2",
      "x3", "x4", "x5", "x6", "x7", "x8", "x9")
    // --- round 9: standing-index amortization for the vector-space /
    // PRF family. tfidfPostings is the inverted index; persisting it
    // bucketed by term turns every query-time scan into an index probe
    // (bucket pruning on the term IN (...) predicate). Measured against
    // the full per-query recompute, plus the 3-scan PRF cost.
    time("tfidf full recompute top-25 (warm)") {
      Search.tfidfTopK(bigDocs, q4, k = 25).count()
      Search.tfidfTopK(bigDocs, q4, k = 25).count()
    }
    val postings = Search.tfidfPostings(bigDocs)
    // clear any stale managed-table location from a previous probe run
    spark.sql("DROP TABLE IF EXISTS probe_tfidf_postings")
    graft.core.Fs.rmTree("spark-warehouse/probe_tfidf_postings")
    time("tfidf postings build + bucketed write (once, amortized)") {
      graft.sources.Bucketing.writeBucketed(postings, "probe_tfidf_postings",
        "term", nBuckets = 32, sortCols = Seq("term"))
    }
    val standing = spark.table("probe_tfidf_postings")
    time("tfidf top-25 from persisted postings (cold)") {
      Search.tfidfTopKFromPostings(standing, q4, k = 25).count()
    }
    time("tfidf top-25 from persisted postings (warm)") {
      Search.tfidfTopKFromPostings(standing, q4, k = 25).count()
    }
    time("prf top-25 (3 corpus scans, warm corpus)") {
      Search.prfTopK(bigDocs, q4, k = 25, fbDocs = 10, fbTerms = 5).count()
    }
    time("bm25 top-25, 40-term query (warm corpus)") {
      Search.bm25TopK(bigDocs, q40, k = 25).count()
    }

    // --- Nx embeddings: exact copies => planted (1 - 1/N) redundancy ---
    // embCopies arg (round 8): 50 → 100k+ vectors at sf0.1, nlist ∝ √N
    // so per-cell pairwise work stays bounded as the table grows
    val embCopies = args.headOption.map(_.toInt).getOrElse(10)
    val ebase = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val en = ebase.agg(max("vec_id")).head().getLong(0) + 1L
    val bigEmb = (0 until embCopies).map { k =>
      ebase.select((col("vec_id") + lit(k * en)).as("vec_id"), col("embedding"))
    }.reduce(_ union _).repartition(32).cache()
    val nEmb = bigEmb.count()
    println(s"probe embeddings: $nEmb (${embCopies}x)")
    val nlistScaled = math.max(32, math.round(math.sqrt(nEmb.toDouble)).toInt)

    val pairs = time(s"semdedup pairs (trained nlist=$nlistScaled, threshold=0.9, cold)") {
      val p = SemDedup.semanticNearDupPairs(bigEmb, threshold = 0.9, nlist = nlistScaled,
        iters = 3, trainSampleMod = 5).cache()
      println(s"  edges: ${p.count()}")
      p
    }
    pairs.unpersist(false)
    time(s"semanticDeduplicate end-to-end (nlist=$nlistScaled)") {
      val kept = SemDedup.semanticDeduplicate(bigEmb, threshold = 0.9, nlist = nlistScaled,
        iters = 3, trainSampleMod = 5).count()
      println(s"  kept: $kept of $nEmb (planted truth: ~N/$embCopies = ${nEmb / embCopies})")
    }
    time(s"semanticDeduplicate end-to-end (nlist=${nlistScaled * 2} — cell-size knob)") {
      println(s"  kept: ${SemDedup.semanticDeduplicate(bigEmb, threshold = 0.9,
        nlist = nlistScaled * 2, iters = 3, trainSampleMod = 5).count()}")
    }
    // quantizer-recall caveat datapoint: exact twins always share a cell
    // (identical vectors assign identically), so planted recall is 1.0 by
    // construction; the interesting number is how many NON-twin pairs the
    // threshold admits per nlist.

    // --- span dedup over the mutated 10x corpus ---
    time("dropRepeatedSpans spanTokens=8 (cold)") {
      val out = Dedup.dropRepeatedSpans(bigDocs, spanTokens = 8)
        .agg(count(lit(1)), sum("n_spans_kept")).head()
      println(s"  surviving docs: ${out.getLong(0)}, spans kept: ${out.getLong(1)}")
    }
    time("dropRepeatedSpans spanTokens=8 (warm)") {
      Dedup.dropRepeatedSpans(bigDocs, spanTokens = 8).count()
    }

    // --- temporal joins at 10x events (user space widened 10x) ---
    val evBase = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("event_type"), col("value"))
    val un = evBase.agg(max("user_id")).head().getLong(0) + 1L
    val bigEv = (0 until 10).map { k =>
      evBase.select((col("user_id") + lit(k * un)).as("user_id"), col("ts"),
        col("event_type"), col("value"))
    }.reduce(_ union _).repartition(32).cache()
    println(s"probe events: ${bigEv.count()}")
    val purch = bigEv.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val clicks = bigEv.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    time("asofJoin backward 10x (cold)") {
      println(s"  rows: ${graft.ext.AsOf.asofJoin(purch, clicks, Seq("user_id"), "ts",
        Seq("value")).count()}")
    }
    time("asofJoin backward 10x (warm)") {
      graft.ext.AsOf.asofJoin(purch, clicks, Seq("user_id"), "ts", Seq("value")).count()
    }
    val wins = bigEv.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("win_start"),
        (col("ts") + expr("INTERVAL 48 HOURS")).as("win_end"))
    time("rangeJoin 48h windows, 6h buckets, 10x (warm events)") {
      println(s"  rows: ${graft.ext.AsOf.rangeJoin(purch, wins, Seq("user_id"), "ts",
        "win_start", "win_end", payloadCols = Nil, bucketWidthSeconds = 21600L).count()}")
    }

    // cell-population sanity for the trained quantizer at nlist=32
    val cents = Similarity.trainIvfCentroids(bigEmb, nlist = 32, iters = 3,
      sampleMod = 5)
    val cells = Similarity.assignCells(bigEmb, cents)
      .groupBy("cell").count().agg(min("count"), max("count"), avg("count")).head()
    println(s"cell sizes nlist=32: min=${cells.getLong(0)} max=${cells.getLong(1)} " +
      f"avg=${cells.getDouble(2)}%.0f")

    spark.stop()
  }
}
