package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextStats}

/** Scale-axis probe for the round-7 text operators: blocklistHits,
  * gopherStats, and dropBoilerplateLines claim linear corpus scaling
  * with bounded shuffles, and the boilerplate pass additionally claims
  * hot-key safety when ONE line is in EVERY doc (the universal-footer
  * worst case — its doc-frequency key receives the whole corpus).
  * Measures 100k vs 1M synthetic docs (~20 words each, zipf-ish token
  * mix, distributed synthesis via spark.range — nothing driver-side)
  * and the viral-footer axis at 1M docs.
  */
object ProbeText {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(label: String)(run: => Unit): Unit = {
      val t0 = System.nanoTime()
      run
      println(f"$label%-46s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    // ~20 words/doc from a 1k-token vocab, quadratic mix for skew
    def docs(n: Long, footer: Boolean) = {
      val words = (0 until 20).map(j =>
        concat(lit("w"), pmod(col("id") * (j * 2 + 7919L) + j, lit(1000L))))
      val body = concat_ws(" ", words: _*)
      spark.range(n).select(col("id").as("doc_id"),
        (if (footer) concat(body, lit("\nall rights reserved footer"))
         else body).as("text"))
    }

    // warm-up
    TextStats.blocklistHits(docs(50000L, footer = false), "doc_id", "text",
      Seq("w1", "w2", "w3")).count()

    // NOTE: `.count()` is the WRONG action for these operators — their
    // result ends in a left join whose right side is unique per key, so
    // Catalyst ELIMINATES the join (and the whole pipeline under it) when
    // no column is referenced; the first cut of this probe "measured"
    // 1M-doc gopherStats at 0.2 s that way. Aggregating over result
    // columns forces full evaluation.
    for (n <- Seq(100000L, 1000000L)) {
      t(s"blocklist_hits n=$n") {
        TextStats.blocklistHits(docs(n, footer = false), "doc_id", "text",
          Seq("w1", "w17", "w333")).agg(sum("n_flagged")).collect()
      }
      t(s"gopher_stats n=$n") {
        TextStats.gopherStats(docs(n, footer = false))
          .agg(sum("n_words"), sum("token_entropy")).collect()
      }
      t(s"boilerplate n=$n (no viral line)") {
        Dedup.dropBoilerplateLines(docs(n, footer = false), minDocFreq = 3)
          .agg(sum("n_lines_kept"), sum(length(col("text")))).collect()
      }
    }
    // viral axis: the SAME footer line in all 1M docs — its doc-frequency
    // key carries the whole corpus; partial-combined countDistinct must
    // keep the task flat (compare against the no-footer row above)
    t("boilerplate n=1000000 (viral footer in EVERY doc)") {
      Dedup.dropBoilerplateLines(docs(1000000L, footer = true), minDocFreq = 3)
        .agg(sum("n_lines_kept"), sum(length(col("text")))).collect()
    }

    // DSIR scale axis (round 8): train both bucket models (target = the
    // 10% doc_id-slice) and score the full corpus — the claim is one
    // gram-keyed aggregate per model plus one doc-keyed score shuffle,
    // all linear in corpus size with a fixed-size (buckets-row) model
    for (n <- Seq(100000L, 1000000L)) {
      val corpus = docs(n, footer = false)
      t(s"dsir train (target=10%) n=$n") {
        val r = graft.ext.Dsir.trainImportanceRatios(
          corpus.filter(col("doc_id") % 10 === 0), corpus, buckets = 1 << 16)
        r.agg(sum("log_ratio")).collect()
      }
      val ratios = graft.ext.Dsir.trainImportanceRatios(
        corpus.filter(col("doc_id") % 10 === 0), corpus, buckets = 1 << 16)
      t(s"dsir score n=$n") {
        graft.ext.Dsir.dsirScores(corpus, ratios, buckets = 1 << 16)
          .agg(sum("dsir_logw"), sum("n_grams")).collect()
      }
      t(s"dsir resample k=10000 n=$n") {
        graft.ext.Dsir.dsirResample(
          graft.ext.Dsir.dsirScores(corpus, ratios, buckets = 1 << 16), k = 10000)
          .agg(sum("gumbel_key")).collect()
      }
    }

    // round-8 corpus-wide diagnostics: gram-duplication profile (two
    // gram-keyed shuffles + a doc rollup — claim linear in corpus) and
    // bottom-k resemblance between the even/odd halves (one key-keyed
    // groupBy + a TakeOrdered cut — claim linear with a k-row result)
    for (n <- Seq(100000L, 1000000L)) {
      val corpus = docs(n, footer = false)
      t(s"gram_duplication k=5 n=$n") {
        TextStats.gramDuplicationStats(corpus, k = 5)
          .agg(sum("n_shared"), sum("n_grams")).collect()
      }
      t(s"resemblance (even vs odd halves) n=$n") {
        val a = corpus.filter(col("doc_id") % 2 === 0)
          .select(explode(Dedup.tokens(col("text"))).as("tok"))
          .select(TextStats.rollingHash(col("tok")).as("key"))
        val b = corpus.filter(col("doc_id") % 2 === 1)
          .select(explode(Dedup.tokens(col("text"))).as("tok"))
          .select(TextStats.rollingHash(col("tok")).as("key"))
        graft.ext.Sketches.corpusResemblance(a, b, "key", 256).collect()
      }
      t(s"zipf_stats topN=1000 n=$n") {
        TextStats.zipfStats(corpus, topN = 1000).collect()
      }
    }
    spark.stop()
  }
}
