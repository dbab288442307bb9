package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** chrF between paired texts (Popović 2015, "chrF: character n-gram
  * F-score for automatic MT evaluation") — the character-level member
  * of the pair-grading family next to [[Bleu]] (word n-gram precision)
  * and [[Rouge]] (LCS / word n-gram recall). Character n-grams make the
  * score robust to tokenization and morphology differences, which is
  * why chrF2 is the standard secondary metric in MT eval and a useful
  * soft-decontamination screen for near-verbatim strings that word
  * tokenizers split differently.
  *
  * Definition (our documented convention, the sacrebleu-compatible
  * shape): both texts are lowercased and ALL whitespace is removed;
  * character n-grams of order n = 1..`maxN` (default 6, the paper's
  * choice) are counted per side; per order,
  *
  *   hit_n = Σ_g min(cnt_c(g), cnt_r(g)),
  *   P_n = hit_n / |c-grams_n|,  R_n = hit_n / |r-grams_n|,
  *
  * an order contributes to the P (resp. R) arithmetic mean iff its own
  * denominator is nonzero, and
  *
  *   chrF_β = (1+β²)·P·R / (β²·P + R)     (β = 2 default, chrF2).
  *
  * Scale shape: one JVM kernel per pair over the Dataset iterator (the
  * [[Rouge.rougeL]] pattern) — linear in characters per pair and
  * embarrassingly parallel across pairs; no shuffle beyond the input's
  * own partitioning, no state off the executor.
  *
  * Determinism / oracle parity: characters are Unicode CODE POINTS (so
  * DuckDB's character slicing replays the gram extraction exactly);
  * per-order ratios are 1e-6-canonized, the P/R means add the canonized
  * ratios in ascending-n order (excluded orders contribute an exact
  * +0.0, mirroring the oracle's coalesce chain) and divide by the
  * included count, P, R are canonized, and F is computed FROM the
  * canonized factors then canonized (the [[Bleu]] convention). Null
  * semantics match [[Rouge]]: null-side pairs are dropped; an empty
  * candidate (after whitespace removal) leaves P and F null, an empty
  * reference leaves R and F null; zero overlap scores 0, not null.
  *
  * Output: (idCol, c_chars, r_chars, chrf_p, chrf_r, chrf). `idCol`
  * must be numeric (the kernel's typed encoder; every driver pair id
  * is). */
object ChrF {

  private def quantD(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Lowercase (Locale.ROOT — Spark's `lower()` and DuckDB's `lower()`
    * are locale-independent, so a Turkish/Azeri default JVM locale must
    * not fold 'I' to dotless 'ı' here), strip ALL whitespace, return
    * code points. */
  private[graft] def stripChars(s: String): Array[Int] =
    s.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", "").codePoints().toArray

  /** Per-order (candGrams, refGrams, hit) for n = 1..maxN. */
  private[graft] def orderStats(c: Array[Int], r: Array[Int], maxN: Int)
      : Array[(Long, Long, Long)] = {
    Array.tabulate(maxN) { k =>
      val n = k + 1
      val cn = math.max(0, c.length - n + 1)
      val rn = math.max(0, r.length - n + 1)
      if (cn == 0 || rn == 0) (cn.toLong, rn.toLong, 0L)
      else {
        val cCounts = new scala.collection.mutable.HashMap[String, Long]()
        var i = 0
        while (i < cn) {
          val g = new String(c, i, n)
          cCounts.update(g, cCounts.getOrElse(g, 0L) + 1L)
          i += 1
        }
        val rCounts = new scala.collection.mutable.HashMap[String, Long]()
        var j = 0
        while (j < rn) {
          val g = new String(r, j, n)
          rCounts.update(g, rCounts.getOrElse(g, 0L) + 1L)
          j += 1
        }
        var hit = 0L
        rCounts.foreach { case (g, rv) =>
          hit += math.min(cCounts.getOrElse(g, 0L), rv)
        }
        (cn.toLong, rn.toLong, hit)
      }
    }
  }

  /** Mean of the canonized per-order ratios: ascending-n left-assoc sum
    * (excluded orders add exact 0.0), divided by the included count;
    * None when no order qualifies. */
  private def ratioMean(stats: Array[(Long, Long, Long)],
      denomOf: ((Long, Long, Long)) => Long): Option[Double] = {
    var sum = 0.0
    var k = 0
    var i = 0
    while (i < stats.length) {
      val d = denomOf(stats(i))
      if (d > 0) { sum += quantD(stats(i)._3.toDouble / d); k += 1 }
      else sum += 0.0
      i += 1
    }
    if (k == 0) None else Some(quantD(sum / k))
  }

  /** Score (idCol, candCol, refCol) pairs; see object doc for the
    * conventions. One row per input pair with both texts non-null. */
  def chrF(pairs: DataFrame, maxN: Int = 6, beta: Double = 2.0,
      idCol: String = "pair_id",
      candCol: String = "candidate",
      refCol: String = "reference"): DataFrame = {
    require(maxN >= 1 && maxN <= 10, s"maxN must be in [1, 10], got $maxN")
    require(beta > 0, s"beta must be positive, got $beta")
    val b2 = beta * beta
    val spark = pairs.sparkSession
    import spark.implicits._
    val base = pairs.filter(col(candCol).isNotNull && col(refCol).isNotNull)
      .select(col(idCol).cast("long").as("pair_id"),
        col(candCol).cast("string"), col(refCol).cast("string"))
      .as[(Long, String, String)]
    base.map { case (id, c, r) =>
      val cc = stripChars(c); val rc = stripChars(r)
      val stats = orderStats(cc, rc, maxN)
      val p = ratioMean(stats, _._1)
      val rr = ratioMean(stats, _._2)
      val f = (p, rr) match {
        case (Some(pv), Some(rv)) =>
          if (pv + rv > 0) Some(quantD((1.0 + b2) * pv * rv / (b2 * pv + rv)))
          else Some(0.0)
        case _ => None
      }
      (id, cc.length.toLong, rc.length.toLong, p, rr, f)
    }.toDF("pair_id", "c_chars", "r_chars", "chrf_p", "chrf_r", "chrf")
      .withColumnRenamed("pair_id", idCol)
  }
}
