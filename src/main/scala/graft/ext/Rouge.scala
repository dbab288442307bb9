package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ROUGE-L between paired texts (Lin 2004, "ROUGE: A Package for
  * Automatic Evaluation of Summaries" §3.1, sentence-level LCS) — the
  * recall-side complement of [[Bleu]]'s n-gram precision for the same
  * pair-grading uses: summary/reference eval, paraphrase-pair QA, and
  * soft decontamination screens (a benchmark answer paraphrased into a
  * training doc shares a long subsequence even when no n-gram survives).
  *
  *   R_lcs = LCS(c, r) / |r|,  P_lcs = LCS(c, r) / |c|,
  *   F_lcs = 2·P·R / (P + R)          (the β = 1 form)
  *
  * The LCS is the classic O(|c|·|r|) two-row dynamic program, run as a
  * per-pair JVM kernel over the mapPartitions iterator (the
  * WeightedBins/Garch flatMap-kernel pattern): the DP is inherently
  * sequential per pair but embarrassingly parallel ACROSS pairs, which
  * is the axis a cluster scales on — no shuffle beyond the input's own
  * partitioning, no state off the executor. Cost is quadratic in token
  * length per pair (fine at document scale; pre-truncate the texts for
  * book-length inputs). Tokenization is the repo-wide whitespace
  * convention with empty tokens dropped.
  *
  * Determinism: the DP is integer-exact; R and P are 1e-6-canonized and
  * F is computed FROM the canonized factors then canonized (the [[Bleu]]
  * convention), so the DuckDB oracle — the same DP unrolled as an
  * anti-diagonal recursive CTE over token lists — replays every score
  * bit-for-bit. Null semantics match [[Bleu]]: pairs with a null side
  * are dropped; an empty candidate leaves P (and F) null, an empty
  * reference leaves R (and F) null; zero overlap scores 0, not null.
  *
  * `idCol` must be numeric (the kernel's typed encoder; every driver
  * pair id is). */
object Rouge {

  private def quantC(c: Column) = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  private[graft] def lcsLen(a: Array[String], b: Array[String]): Long = {
    if (a.isEmpty || b.isEmpty) return 0L
    // two-row DP; prev(j) = LCS(a[0..i-1], b[0..j]), O(|b|) memory
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      var j = 1
      while (j <= b.length) {
        cur(j) =
          if (a(i - 1) == b(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
      i += 1
    }
    prev(b.length).toLong
  }

  private def tokens(s: String): Array[String] =
    // Locale.ROOT: match Spark/DuckDB lower() under any default JVM locale
    s.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+").filter(_.nonEmpty)

  /** ROUGE-N (Lin 2004 §2): clipped n-gram RECALL between paired texts —
    * the recall-side mirror of [[Bleu]]'s clipped n-gram precision,
    * completing the eval-grading family (ROUGE-N counts how much of the
    * REFERENCE the candidate recovers; BLEU counts how much of the
    * candidate is in the reference). P and F1 ride along (the
    * rouge-score package convention).
    *
    *   hit = Σ_g min(cnt_cand(g), cnt_ref(g))
    *   R = hit / Σ_g cnt_ref(g),  P = hit / Σ_g cnt_cand(g)
    *
    * n-grams come from n−1 chained `lead`s over the (pair, pos) window —
    * the [[Bleu]] lead-window recipe, linear per token, never a
    * `transform` lambda over a derived array (the round-7 quadratic
    * trap); n is capped at 4 (the ROUGE-1..4 family) to keep the lead
    * chain literal. Same pair-keyed scale shape and 1e-6 canon
    * conventions as [[Bleu.bleu2]]; null-side pairs are dropped, a side
    * with no n-grams (< n tokens) leaves its ratio (and F) null, zero
    * overlap scores 0. Output: (idCol, c_ngrams, r_ngrams, hit,
    * rouge_r, rouge_p, rouge_f). */
  def rougeN(pairs: DataFrame, n: Int = 2,
      idCol: String = "pair_id",
      candCol: String = "candidate",
      refCol: String = "reference"): DataFrame = {
    require(n >= 1 && n <= 4, s"n must be in [1, 4], got $n")
    val base = pairs.filter(col(candCol).isNotNull && col(refCol).isNotNull)
    def grams(c: String): DataFrame = {
      val side = base
        .select(col(idCol), posexplode(split(lower(trim(col(c))), "\\s+"))
          .as(Seq("pos", "w")))
        .filter(col("w") =!= "")
      val wnd = Window.partitionBy(idCol).orderBy("pos")
      val leads = (1 until n).foldLeft(side) { (df, i) =>
        df.withColumn(s"w$i", lead("w", i).over(wnd))
      }
      val gram = concat_ws(" ", (col("w") +: (1 until n).map(i => col(s"w$i"))): _*)
      val full = if (n == 1) leads else leads.filter(col(s"w${n - 1}").isNotNull)
      full.select(col(idCol), gram.as("g"))
        .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("cnt"))
    }
    val cg = grams(candCol)
    val rg = grams(refCol)
    val joined = cg.join(rg.withColumnRenamed("cnt", "rcnt"), Seq(idCol, "g"), "full_outer")
      .groupBy(col(idCol))
      .agg(sum(least(coalesce(col("cnt"), lit(0L)), coalesce(col("rcnt"), lit(0L))))
          .as("hit"),
        sum(coalesce(col("cnt"), lit(0L))).as("c_ngrams"),
        sum(coalesce(col("rcnt"), lit(0L))).as("r_ngrams"))
    base.select(col(idCol))
      .join(joined, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("c_ngrams"), lit(0L)).as("c_ngrams"),
        coalesce(col("r_ngrams"), lit(0L)).as("r_ngrams"),
        coalesce(col("hit"), lit(0L)).as("hit"))
      .withColumn("rouge_r",
        when(col("r_ngrams") > 0, quantC(col("hit") / col("r_ngrams"))))
      .withColumn("rouge_p",
        when(col("c_ngrams") > 0, quantC(col("hit") / col("c_ngrams"))))
      .withColumn("rouge_f",
        when(col("rouge_r").isNotNull && col("rouge_p").isNotNull,
          when(col("rouge_r") + col("rouge_p") > 0,
            quantC(lit(2.0) * col("rouge_p") * col("rouge_r") /
              (col("rouge_p") + col("rouge_r"))))
            .otherwise(lit(0.0))))
  }

  /** Score (idCol, candCol, refCol) pairs. Output: (idCol, c_len, r_len,
    * lcs_len, rouge_r, rouge_p, rouge_f), one row per input pair with
    * both texts non-null. */
  def rougeL(pairs: DataFrame,
      idCol: String = "pair_id",
      candCol: String = "candidate",
      refCol: String = "reference"): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val base = pairs.filter(col(candCol).isNotNull && col(refCol).isNotNull)
      .select(col(idCol).cast("long").as("pair_id"),
        col(candCol).cast("string"), col(refCol).cast("string"))
      .as[(Long, String, String)]
    val raw = base.map { case (id, c, r) =>
      val ct = tokens(c); val rt = tokens(r)
      (id, ct.length.toLong, rt.length.toLong, lcsLen(ct, rt))
    }.toDF("pair_id", "c_len", "r_len", "lcs_len")
    raw
      .withColumn("rouge_r",
        when(col("r_len") > 0, quantC(col("lcs_len") / col("r_len"))))
      .withColumn("rouge_p",
        when(col("c_len") > 0, quantC(col("lcs_len") / col("c_len"))))
      .withColumn("rouge_f",
        when(col("rouge_r").isNotNull && col("rouge_p").isNotNull,
          when(col("rouge_r") + col("rouge_p") > 0,
            quantC(lit(2.0) * col("rouge_p") * col("rouge_r") /
              (col("rouge_p") + col("rouge_r"))))
            .otherwise(lit(0.0))))
      .withColumnRenamed("pair_id", idCol)
  }
}
