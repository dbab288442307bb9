package graft

import graft.ext.{Bpe, BpeMerge}
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("wordFreqs + pairStats: hand-computed counts on a tiny corpus") {
    val docs = Seq((1L, "low LOW"), (2L, " lower ")).toDF("doc_id", "text")
    val freqs = Bpe.wordFreqs(docs).as[(String, Long)].collect().toMap
    assert(freqs == Map("low" -> 2L, "lower" -> 1L))
    val pairs = Bpe.pairStats(Bpe.initialDict(docs))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pairs == Map(
      ("l", "o") -> 3L, ("o", "w") -> 3L, ("w", "</w>") -> 2L,
      ("w", "e") -> 1L, ("e", "r") -> 1L, ("r", "</w>") -> 1L), s"$pairs")
  }

  test("trainBpe: the Sennrich worked example, with count-then-lexicographic ties") {
    // low×5 lower×2 newest×6 widest×3 — the published example's frequencies
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val merges = Bpe.trainBpe(docs, numMerges = 5)
    assert(merges == Seq(
      BpeMerge(1, "e", "s", 9),      // (e,s)/(s,t)/(t,</w>) tie at 9 → s1 asc
      BpeMerge(2, "es", "t", 9),     // (es,t)/(t,</w>) tie at 9 → 'es' < 't'
      BpeMerge(3, "est", "</w>", 9),
      BpeMerge(4, "l", "o", 7),      // (l,o)/(o,w) tie at 7
      BpeMerge(5, "lo", "w", 7)), s"$merges")
  }

  test("trainBpe: minCount stops the loop early") {
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    // pairs: (a,b)×2, (b,</w>)×2, (c,d)×1, (d,</w>)×1 — at minCount=2 only
    // the first two merges can fire before every remaining pair is unique
    val merges = Bpe.trainBpe(docs, numMerges = 10, minCount = 2L)
    assert(merges.length < 10)
    assert(merges.forall(_.cnt >= 2L))
    assert(merges.head == BpeMerge(1, "a", "b", 2))
  }

  test("mergePair fold ≡ applyMergesLocal: exhaustive over short {a,b} words") {
    val words = for {
      len <- 1 to 6
      bits <- 0 until (1 << len)
    } yield (0 until len).map(i => if (((bits >> i) & 1) == 0) "a" else "b").mkString
    val df = words.toDF("word")
      .withColumn("syms", Bpe.initialSymbols(col("word")))
    for (pair <- Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "</w>"))) {
      val viaFold = df
        .select(col("word"), Bpe.mergePair(col("syms"), pair._1, pair._2).as("m"))
        .as[(String, Seq[String])].collect().toMap
      words.foreach { w =>
        val viaLocal = Bpe.applyMergesLocal(w, Seq(pair)).toSeq
        assert(viaFold(w) == viaLocal, s"word=$w pair=$pair: ${viaFold(w)} vs $viaLocal")
      }
    }
  }

  test("trainBpeLocal ≡ distributed sequential ≡ distributed batched, random corpora") {
    val rng = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val alphabet = "abc"
      val words = (0 until 25).map { _ =>
        (0 until (1 + rng.nextInt(5))).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
      }
      val text = words.flatMap(w => Seq.fill(1 + rng.nextInt(6))(w)).mkString(" ")
      val docs = Seq((1L, text)).toDF("doc_id", "text")
      val viaLocal = Bpe.trainBpe(docs, numMerges = 12, minCount = 1L)
      val viaSeq = Bpe.trainBpe(docs, numMerges = 12, minCount = 1L,
        localDictMaxWords = 0L, batchLimit = 1)
      val viaBatch = Bpe.trainBpe(docs, numMerges = 12, minCount = 1L,
        localDictMaxWords = 0L, batchLimit = 64)
      assert(viaLocal == viaSeq, s"trial $trial local vs sequential:\n$viaLocal\n$viaSeq")
      assert(viaBatch == viaSeq, s"trial $trial batched vs sequential:\n$viaBatch\n$viaSeq")
    }
  }

  test("safeBatchPrefix: contiguity, interference, self-pair, strict-drop guard") {
    def sb(c: Seq[(String, String, Long)], next: Option[Long]) =
      Bpe.safeBatchPrefix(c, k => if (k < c.length) Some(c(k)._3) else next)
    // disjoint candidates with strictly dropping counts: all taken
    val disj = Seq(("a", "b", 10L), ("c", "d", 8L), ("e", "f", 6L))
    assert(sb(disj, Some(4L)) == disj)
    // shared input symbol stops the batch at the interferer
    assert(sb(Seq(("a", "b", 10L), ("b", "c", 8L)), Some(4L)) == Seq(("a", "b", 10L)))
    // later candidate consuming an earlier merged token stops the batch
    assert(sb(Seq(("a", "b", 10L), ("ab", "c", 8L)), Some(4L)) == Seq(("a", "b", 10L)))
    // earlier candidate's input equal to a later token stops the batch
    assert(sb(Seq(("ab", "c", 10L), ("a", "b", 8L)), Some(4L)) == Seq(("ab", "c", 10L)))
    // self-pair ends the batch at itself
    assert(sb(Seq(("c", "d", 10L), ("a", "a", 8L), ("e", "f", 6L)), Some(4L))
      == Seq(("c", "d", 10L), ("a", "a", 8L)))
    // no strict count drop after the batch: shrink until it holds (k=1 exact)
    assert(sb(Seq(("a", "b", 10L), ("c", "d", 8L)), Some(8L)) == Seq(("a", "b", 10L)))
    // complete list fully consumed: guard vacuous
    assert(sb(disj, None) == disj)
  }

  test("mergePairsBatch ≡ one mergePair pass per batch member") {
    val words = Seq("abcd", "abab", "cdcd", "acbd", "dcba", "aabbccdd", "abcdabcd")
    val batch = Seq(("a", "b"), ("c", "d"))
    val df = words.toDF("word").withColumn("syms", Bpe.initialSymbols(col("word")))
    val viaBatch = df.select(col("word"),
        Bpe.mergePairsBatch(col("syms"), batch).as("m"))
      .as[(String, Seq[String])].collect().toMap
    words.foreach { w =>
      val seq = batch.foldLeft(w.map(_.toString).toArray :+ Bpe.Eow) {
        case (s, (a, b)) => Bpe.mergeOnce(s, a, b) }
      assert(viaBatch(w) == seq.toSeq, s"word=$w: ${viaBatch(w)} vs ${seq.toSeq}")
    }
  }

  test("trainBpeLocal: a 1,000-merge vocabulary trains without Spark jobs") {
    // synthetic dictionary large enough to sustain 1,000 distinct merges
    val rng = new scala.util.Random(7)
    val alphabet = "abcdefghijklmnop"
    val dict = (0 until 3000).map { i =>
      val w = (0 until (4 + rng.nextInt(9))).map(_ => alphabet(rng.nextInt(16))).mkString
      (w + i.toString, 1L + rng.nextInt(50))
    }.distinct
    val merges = Bpe.trainBpeLocal(dict, numMerges = 1000, minCount = 1L)
    assert(merges.length == 1000, s"got ${merges.length}")
    // ranks are 1..n and counts are achievable (positive)
    assert(merges.map(_.rank) == (1L to 1000L))
    assert(merges.forall(_.cnt >= 1L))
  }

  test("tokenize: merges apply in rank order, doc order preserved") {
    val merges = Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"))
    val docs = Seq((1L, "newest low"), (2L, "   "), (3L, "widest")).toDF("doc_id", "text")
    val out = Bpe.tokenize(docs, merges)
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("n", "e", "w", "est</w>", "low", "</w>"), s"${out(1L)}")
    assert(out(3L) == Seq("w", "i", "d", "est</w>"))
    assert(!out.contains(2L)) // no words → absent, matching the oracle's inner join
  }

  test("tokenize round-trips the text: concatenating subwords restores each word") {
    val docs = Seq((1L, "Interchangeable interchangeability")).toDF("doc_id", "text")
    val merges = Bpe.trainBpe(docs, numMerges = 6, minCount = 1L)
    val toks = Bpe.tokenize(docs, merges.map(m => (m.s1, m.s2)))
      .as[(Long, Seq[String])].collect().head._2
    val restored = toks.mkString("").replace(Bpe.Eow, " ").trim
    assert(restored == "interchangeable interchangeability", s"$toks")
  }

  test("fertilityStats: hand-checked counts under explicit merges") {
    // with merge (a,b): "abc" -> [ab, c, </w>] (3), "ab" -> [ab, </w>] (2),
    // "x" -> [x, </w>] (2)
    val docs = Seq((1L, "abc ab"), (2L, "x"), (3L, "   ")).toDF("doc_id", "text")
    val r = Bpe.fertilityStats(docs, Seq(("a", "b"))).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDouble(4), x.getDouble(5)))).toMap
    assert(r(1L) == ((2L, 5L, 5L, 2.5, 1.0)), s"${r(1L)}")
    assert(r(2L) == ((1L, 2L, 1L, 2.0, 0.5)), s"${r(2L)}")
    // wordless docs are absent (inner vocabulary join, like tokenize)
    assert(!r.contains(3L))
    // more merges can only LOWER per-word token counts (monotonicity)
    val deep = Bpe.fertilityStats(docs, Seq(("a", "b"), ("ab", "c")))
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(deep(1L) < r(1L)._2, s"${deep(1L)}")
  }
}
