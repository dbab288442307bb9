package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sentence-level BLEU-2 between paired texts (Papineni et al. 2002):
  * modified (clipped) unigram and bigram precisions with the brevity
  * penalty — the n-gram overlap score a data pipeline uses to grade
  * candidate/reference eval pairs, flag suspicious near-matches between
  * a training shard and a benchmark (the soft complement of exact
  * n-gram decontamination), and monitor paraphrase/translation pair
  * quality.
  *
  *   p_n  = Σ_g min(cnt_cand(g), cnt_ref(g)) / Σ_g cnt_cand(g)
  *   bp   = 1 if c ≥ r else exp(1 − r/c)
  *   bleu = bp · √(p1 · p2)
  *
  * Fixed at n ≤ 2 by design: bigrams come from ONE `lead` over the
  * (pair, pos) window — the phrase-blocklist recipe — never from a
  * `transform` lambda over a derived token array (Catalyst inlines the
  * array per element; the round-7 quadratic-lambda trap). Tokenization
  * is the repo-wide whitespace convention with empty tokens dropped
  * (a whitespace-only side has length 0).
  *
  * Scale shape: everything is pair-keyed — two token scans (candidate,
  * reference), per-(pair, gram) map-combinable counts, a (pair, gram)
  * equijoin for the clip (a gram viral WITHIN one pair skews one key —
  * the AQE case), and one final per-pair rollup. No corpus-wide state.
  *
  * Determinism: p1, p2, bp are 1e-6-canonized, and bleu is computed
  * FROM the canonized factors (multiplication and √ are correctly
  * rounded, so engines sharing the canonized inputs share the product)
  * then canonized itself; exp's cross-engine ulps are absorbed by the
  * bp canon (the bm25 ln precedent). Null semantics: a null text, an
  * empty candidate (p1 undefined: 0/0), or a 1-token candidate (no
  * bigrams) yields null bleu — not 0, which is reserved for "no
  * overlap"; a candidate with zero matched unigrams scores bleu 0. */
object Bleu {

  private def quantC(c: Column) = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Score (idCol, candCol, refCol) pairs. Output: (idCol, c_len,
    * r_len, p1, p2, bp, bleu), one row per input pair with both texts
    * non-null. */
  def bleu2(pairs: DataFrame,
      idCol: String = "pair_id",
      candCol: String = "candidate",
      refCol: String = "reference",
      hashKeys: Boolean = false): DataFrame = {
    val base = pairs.filter(col(candCol).isNotNull && col(refCol).isNotNull)
    // hashKeys (the corpus-scale driver shape, shared with rougeN r14):
    // uni/bi gram keys from native TokenGramHashes passes over the token
    // array — no (pair, pos) sort exchange, no gram strings, 8-byte keys
    // through the four count shuffles and both clip joins; the lengths
    // come from size(toks) in the same projection instead of two more
    // counting aggregates. Hashing only relabels the clip groups, so
    // every hit/total (hence p1/p2/bp/bleu) is identical absent a
    // collision; BleuSpec pins the equivalence.
    def toks(c: String): DataFrame = base
      .select(col(idCol), posexplode(split(lower(trim(col(c))), "\\s+"))
        .as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    def toksArr(c: String): DataFrame = base
      .select(col(idCol),
        filter(split(lower(trim(col(c))), "\\s+"), t => length(t) > 0).as("__toks"))
    def gramCounts(side: DataFrame): (DataFrame, DataFrame) = {
      val uni = side.groupBy(col(idCol), col("w").as("g"))
        .agg(count(lit(1)).as("cnt"))
      val wnd = Window.partitionBy(idCol).orderBy("pos")
      val bi = side
        .withColumn("w2", lead("w", 1).over(wnd))
        .filter(col("w2").isNotNull)
        .select(col(idCol), concat_ws(" ", col("w"), col("w2")).as("g"))
        .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("cnt"))
      (uni, bi)
    }
    def gramCountsH(side: DataFrame, k: Int): DataFrame = side
      .select(col(idCol),
        explode(graft.expr.TokenGramHashes.tokenGramHashes(col("__toks"), k)).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("cnt"))
    val (cu, cb, ru, rb, lens0) = if (hashKeys) {
      val ca = toksArr(candCol)
      val ra = toksArr(refCol)
      (gramCountsH(ca, 1), gramCountsH(ca, 2), gramCountsH(ra, 1), gramCountsH(ra, 2),
        ca.select(col(idCol), size(col("__toks")).cast("long").as("c_len"))
          .join(ra.select(col(idCol), size(col("__toks")).cast("long").as("r_len")),
            Seq(idCol)))
    } else {
      val cand = toks(candCol)
      val ref = toks(refCol)
      val (cu0, cb0) = gramCounts(cand)
      val (ru0, rb0) = gramCounts(ref)
      (cu0, cb0, ru0, rb0,
        base.select(col(idCol))
          .join(cand.groupBy(col(idCol)).agg(count(lit(1)).as("c_len")), Seq(idCol), "left")
          .join(ref.groupBy(col(idCol)).agg(count(lit(1)).as("r_len")), Seq(idCol), "left")
          .select(col(idCol),
            coalesce(col("c_len"), lit(0L)).as("c_len"),
            coalesce(col("r_len"), lit(0L)).as("r_len")))
    }
    def clipped(c: DataFrame, r: DataFrame): DataFrame = c
      .join(r.withColumnRenamed("cnt", "rcnt"), Seq(idCol, "g"), "left")
      .groupBy(col(idCol))
      .agg(sum(least(col("cnt"), coalesce(col("rcnt"), lit(0L)))).as("hit"),
        sum(col("cnt")).as("total"))
    val p1 = clipped(cu, ru)
      .select(col(idCol), quantC(col("hit") / col("total")).as("p1"))
    val p2 = clipped(cb, rb)
      .select(col(idCol), quantC(col("hit") / col("total")).as("p2"))
    lens0
      .join(p1, Seq(idCol), "left")
      .join(p2, Seq(idCol), "left")
      .withColumn("bp",
        when(col("c_len") === 0, lit(null).cast("double"))
          .when(col("c_len") >= col("r_len"), lit(1.0))
          .otherwise(quantC(exp(lit(1.0) - col("r_len") / col("c_len")))))
      .withColumn("bleu",
        when(col("p1").isNotNull && col("p2").isNotNull && col("bp").isNotNull,
          quantC(col("bp") * sqrt(col("p1") * col("p2")))))
  }
}
