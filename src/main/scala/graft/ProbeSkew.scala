package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Packing, Search}

/** Hot-key skew probe for the LLM-pipeline shuffles (round-5 verdict #7).
  *
  * The scaladoc claims under test:
  *   - `Search.bm25Scores` ("query-term filter before the shuffle"): a term
  *     that appears in EVERY document makes its posting list corpus-sized.
  *     The tf aggregation keys on (doc_id, term) — the hot term spreads
  *     over all doc_ids, so no single reducer owns it — and the df count
  *     keyed on the term alone collapses map-side (partial agg emits one
  *     row per partition, 32 rows total cross the shuffle, not N).
  *   - `Dedup.dropRepeatedSpans` ("min-struct winner = map-side partial
  *     agg, skew-safe"): a span shared by EVERY document puts N rows
  *     under one groupBy key. The winner agg collapses map-side for the
  *     same reason as df, and the join-free plan projects survivors
  *     straight out of that aggregation — no exchange in the operator
  *     carries the span text as a key, so the viral span has nowhere to
  *     concentrate. Timed with AQE on vs off anyway to show neither
  *     path depends on skew-splitting.
  *
  * The driver's documents fixture has a 31-term vocabulary with every term
  * at df ≈ 0.78·N — every token is already "viral", so it cannot exhibit a
  * skewed key distribution. The probe therefore derives a realistic corpus
  * from it: each document keeps its fixture text and gains 10 tokens unique
  * to that document (df = 1, the long tail), so the derived vocabulary is
  * ~10·N rare terms plus the 31 fixture terms. Each doc is then PADDED with
  * unique filler tokens to a multiple of `spanTokens` so the planted
  * 8-token viral span starts exactly on a chunk boundary and forms the
  * IDENTICAL chunk_text in every document — the probe prints the realized
  * top span-key frequency so the df = N claim is auditable, not assumed.
  * Both probe corpora (with and without the plant) carry the same
  * unique-token tail and padding, so the timed contrast isolates the hot
  * key, not corpus size or chunk alignment.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.ProbeSkew
  */
object ProbeSkew {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import ProbeUtil.time

    val spanTokens = 8

    // Long-tail plant: 10 tokens unique to each document (df = 1 each),
    // then unique filler tokens up to the next spanTokens boundary so an
    // appended span chunks as one block. Padding is per-doc-unique too —
    // it must not create accidental shared spans.
    val tail = concat_ws(" ",
      (0 until 10).map(i => concat(lit(s"u${i}d"), col("doc_id"))): _*)
    val withTail = concat_ws(" ", col("text"), tail)
    // Token count MUST use the chunker's own tokenization (Dedup.tokens:
    // trim + lower) — a raw split would count empty leading elements on
    // whitespace-padded fixture text and silently misalign the planted
    // span's chunk boundary.
    val nToks = size(Dedup.tokens(withTail))
    val padLen = (lit(spanTokens) - nToks % spanTokens) % spanTokens
    val padPool = array((0 until spanTokens - 1).map(i =>
      concat(lit(s"p${i}x"), col("doc_id"))): _*)
    val padded = concat_ws(" ", withTail,
      array_join(slice(padPool, lit(1), padLen), " "))
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), padded.as("text"))
      .repartition(32).cache()
    val n = base.count()
    println(s"probe docs: $n")

    // The viral 8-token span doubles as the carrier of the viral token.
    val viralSpan = "viraltok alpha beta gamma delta epsilon zeta eta"
    val skewed = base
      .select(col("doc_id"), concat_ws(" ", col("text"), lit(viralSpan)).as("text"))
      .cache()
    skewed.count()

    // Hot-key magnitudes, printed so the df = N claims are auditable:
    // term level (BM25's shuffle key) and realized chunk level (span
    // dedup's groupBy key, AFTER the chunker — alignment included).
    val df = skewed
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("t"))
      .distinct().groupBy("t").agg(count(lit(1)).as("df"))
    df.cache()
    val viralDfRow = df.filter(col("t") === "viraltok").head()
    val tailDf = df.filter(col("t").rlike("^u[0-9]d[0-9]+$")).agg(max("df")).head()
    // max() over an empty filter yields NULL — e.g. if doc_id stops being a
    // numeric string after a testdata regeneration. Diagnose, don't NPE.
    val tailMax = if (tailDf.isNullAt(0)) "NO TAIL TOKENS MATCHED (doc_id format changed?)"
                  else tailDf.getLong(0).toString
    println(s"viral term df=${viralDfRow.getLong(1)} of $n docs; " +
      s"max tail-term df=$tailMax; vocab=${df.count()}")
    df.unpersist()
    val spanFreq = Packing.chunkByTokenBudget(skewed, maxTokens = spanTokens, overlap = 0)
      .groupBy("chunk_text").agg(count(lit(1)).as("c"))
      .orderBy(desc("c")).limit(2).collect()
    println("top span-key frequencies: " +
      spanFreq.map(r => s"${r.getLong(1)}x [${r.getString(0).take(30)}...]").mkString(", "))

    def aqe(on: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", on.toString)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", on.toString)
    }

    // Rare-terms query (df=1 each, resolves to one doc) vs the same query
    // with the df=N viral term swapped in: the ONLY difference is the hot
    // posting list.
    val qNormal = Seq("u0d17", "u1d17", "u2d17", "u3d17")
    val qHot = Seq("viraltok", "u1d17", "u2d17", "u3d17")
    for (on <- Seq(true, false)) {
      aqe(on)
      time(s"bm25 top-25, 4 rare terms df=1 (aqe=$on)") {
        Search.bm25TopK(skewed, qNormal, k = 25).count()
      }
      time(s"bm25 top-25, same query incl. df=N viral term (aqe=$on)") {
        Search.bm25TopK(skewed, qHot, k = 25).count()
      }
    }

    for (on <- Seq(true, false)) {
      aqe(on)
      time(s"dropRepeatedSpans long-tail corpus, no viral span (aqe=$on)") {
        Dedup.dropRepeatedSpans(base, spanTokens = spanTokens).count()
      }
      time(s"dropRepeatedSpans viral span in EVERY doc (aqe=$on)") {
        val out = Dedup.dropRepeatedSpans(skewed, spanTokens = spanTokens)
          .agg(count(lit(1)), sum("n_spans_kept")).head()
        println(s"  surviving docs: ${out.getLong(0)}, spans kept: ${out.getLong(1)}")
      }
    }
    aqe(on = true)

    spark.stop()
  }
}
