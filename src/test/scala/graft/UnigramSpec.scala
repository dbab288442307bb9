package graft

import graft.ext.Unigram
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("pieceCounts: substrings up to maxPieceLen, weighted by word frequency") {
    val pc = Unigram.pieceCounts(docs("ab ab b"), maxPieceLen = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "ab" ×2 contributes a, b, ab each twice; "b" ×1 adds one b
    assert(pc == Map("a" -> 2L, "b" -> 3L, "ab" -> 2L), s"got $pc")
  }

  test("seedVocab keeps every single char and cuts multis by (cnt desc, piece asc)") {
    val v = Unigram.seedVocab(docs("xy xz xy q"), maxPieceLen = 2, maxMulti = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // multis: xy=2, xz=1 → top-1 keeps xy; chars all kept (q included)
    assert(v == Map("x" -> 3L, "y" -> 2L, "z" -> 1L, "q" -> 1L, "xy" -> 2L), s"got $v")
  }

  test("viterbiLocal picks the max-logprob segmentation") {
    val lp = Map("a" -> -1.0, "b" -> -2.0, "ab" -> -2.5)
    val (toks, s) = Unigram.viterbiLocal("ab", lp)
    assert(toks.toSeq == Seq("ab") && s == -2.5, s"got ${toks.toSeq} / $s")
    val (toks2, s2) = Unigram.viterbiLocal("aab", lp)
    assert(toks2.toSeq == Seq("a", "ab") && s2 == -3.5, s"got ${toks2.toSeq}")
  }

  test("viterbiLocal tie rule: equal score keeps the shorter final piece") {
    val lp = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0)
    val (toks, s) = Unigram.viterbiLocal("ab", lp)
    assert(toks.toSeq == Seq("a", "b") && s == -2.0, s"got ${toks.toSeq}")
  }

  test("OOV single char scores UnkLogProb; longer OOV pieces are not candidates") {
    val lp = Map("a" -> -1.0)
    val (toks, s) = Unigram.viterbiLocal("axa", lp)
    assert(toks.toSeq == Seq("a", "x", "a"), s"got ${toks.toSeq}")
    assert(s == -2.0 + Unigram.UnkLogProb)
  }

  test("tokenize reassembles docs in position order with summed logprob") {
    val lp = Map("a" -> -1.0, "b" -> -2.0, "ab" -> -2.5, "c" -> -0.5)
    val out = Unigram.tokenize(docs("ab c", "c ab ab"), lp)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[scala.collection.Seq[String]]("uni_tokens").toSeq == Seq("ab", "c"))
    assert(out(0).getAs[Double]("logprob") == -3.0)
    assert(out(1).getAs[scala.collection.Seq[String]]("uni_tokens").toSeq == Seq("c", "ab", "ab"))
    assert(out(1).getAs[Long]("n_uni_tokens") == 3L)
  }

  test("expectedCountsLocal: per-position piece posteriors sum to 1") {
    val lp = Map("a" -> -1.0, "b" -> -1.5, "ab" -> -1.2, "ba" -> -2.0)
    val word = "abab"
    val (ec, z) = Unigram.expectedCountsLocal(word, 1L, lp, 4)
    assert(z > Double.NegativeInfinity)
    // coverage identity: Σ_pieces (occurrences covering position p) · posterior = 1
    // equivalently Σ expected_count(piece) · len(piece) = len(word)
    val mass = ec.map { case (p, c) => p.length * c }.sum
    assert(math.abs(mass - word.length) < 1e-9, s"mass=$mass")
    // freq weighting is linear
    val (ec5, z5) = Unigram.expectedCountsLocal(word, 5L, lp, 4)
    assert(z5 == z)
    ec.foreach { case (p, c) => assert(math.abs(ec5(p) - 5 * c) < 1e-9) }
  }

  test("prob-space kernel agrees with the log-space kernel on covered words") {
    val lp = Map("a" -> -1.0, "b" -> -1.5, "ab" -> -1.2, "ba" -> -2.0)
    val p = lp.map { case (k, v) => k -> math.exp(v) }
    for (word <- Seq("abab", "aaa", "b", "abba")) {
      val (ecLog, zLog) = Unigram.expectedCountsLocal(word, 3L, lp, 4)
      val (ecProb, zProb) = Unigram.expectedCountsProbLocal(word, 3L, p, 4)
      assert(math.abs(math.exp(zLog) - zProb) < 1e-12 * zProb, s"Z mismatch for $word")
      assert(ecLog.keySet == ecProb.keySet, s"piece sets differ for $word")
      ecLog.foreach { case (piece, c) =>
        assert(math.abs(c - ecProb(piece)) < 1e-9, s"$word/$piece: $c vs ${ecProb(piece)}")
      }
      // coverage identity holds in prob space too
      val mass = ecProb.map { case (pc, c) => pc.length * c }.sum
      assert(math.abs(mass - 3L * word.length) < 1e-9)
    }
    // uncovered word: prob kernel skips (Z = 0), log kernel charges UnkLogProb
    val (ecX, zX) = Unigram.expectedCountsProbLocal("axa", 1L, p, 4)
    assert(zX == 0.0 && ecX.isEmpty)
  }

  test("eStepProb equals summed local prob kernels") {
    val p = Map("a" -> 0.25, "b" -> 0.125, "ab" -> 0.0625)
    val dict = Seq(("ab", 3L), ("aab", 2L), ("b", 7L)).toDF("word", "freq")
    val out = Unigram.eStepProb(dict, p, 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val local = Seq(("ab", 3L), ("aab", 2L), ("b", 7L))
      .map { case (w, f) => Unigram.expectedCountsProbLocal(w, f, p, 4)._1 }
      .foldLeft(Map.empty[String, Double]) { (m, ec) =>
        ec.foldLeft(m) { case (mm, (pc, c)) => mm.updated(pc, mm.getOrElse(pc, 0.0) + c) }
      }
    assert(out.keySet == local.keySet)
    local.foreach { case (pc, c) => assert(math.abs(out(pc) - c) < 1e-9, s"piece $pc") }
  }

  test("distributed eStep equals the sum of local kernels") {
    val lp = Map("a" -> -1.0, "b" -> -1.5, "ab" -> -1.2)
    val dict = Seq(("ab", 3L), ("aab", 2L), ("b", 7L)).toDF("word", "freq")
    val (counts, ll) = Unigram.eStep(dict, lp, 4)
    val local = Seq(("ab", 3L), ("aab", 2L), ("b", 7L)).map { case (w, f) =>
      Unigram.expectedCountsLocal(w, f, lp, 4)
    }
    val merged = local.map(_._1).foldLeft(Map.empty[String, Double]) { (m, ec) =>
      ec.foldLeft(m) { case (mm, (p, c)) => mm.updated(p, mm.getOrElse(p, 0.0) + c) }
    }
    val llLocal = Seq(3L, 2L, 7L).zip(local.map(_._2)).map { case (f, z) => f * z }.sum
    assert(math.abs(ll - llLocal) < 1e-9)
    merged.foreach { case (p, c) => assert(math.abs(counts(p) - c) < 1e-9, s"piece $p") }
  }

  test("EM ascends corpus likelihood round over round") {
    val d = docs("the quick brown fox", "the lazy dog the end", "quick the fog")
    val dict = graft.ext.Bpe.wordFreqs(d)
    var lp = Unigram.seedLogProbs(Unigram.seedVocab(d, maxPieceLen = 3, maxMulti = 20))
    var prevLl = Double.NegativeInfinity
    (1 to 3).foreach { _ =>
      val (counts, ll) = Unigram.eStep(dict, lp, 3)
      assert(ll >= prevLl - 1e-9, s"likelihood fell: $prevLl -> $ll")
      prevLl = ll
      val total = counts.values.sum
      lp = counts.collect { case (p, c) if c > 0.0 => p -> math.log(c / total) }.toMap
    }
  }

  test("trainUnigram prunes multis to vocabSize but never chars; tokenize still total") {
    val d = docs("abc abd abc", "bcd abc abd")
    val lp = Unigram.trainUnigram(d, maxPieceLen = 3, maxMulti = 50,
      emIters = 2, vocabSize = 6)
    val chars = lp.keys.filter(_.length == 1).toSet
    assert(Set("a", "b", "c", "d").subsetOf(chars), s"chars dropped: $lp")
    assert(lp.keys.count(_.length > 1) <= math.max(6 - chars.size, 0), s"got $lp")
    val toks = Unigram.tokenize(d, lp).orderBy("doc_id").collect()
    assert(toks.length == 2 && toks.forall(_.getAs[Long]("n_uni_tokens") > 0))
  }
}
