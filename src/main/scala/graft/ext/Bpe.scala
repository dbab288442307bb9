package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One learned merge: at `rank`, adjacent symbol pair (s1, s2) — occurring
  * `cnt` times, weighted by word frequency — is rewritten to s1+s2. */
case class BpeMerge(rank: Long, s1: String, s2: String, cnt: Long)

/** Byte-pair-encoding tokenizer training + application — the published
  * subword algorithm (Sennrich, Haddow & Birch 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") restructured for Spark.
  *
  * The classic algorithm trains on a word-frequency DICTIONARY, not the
  * corpus: one corpus scan builds (word, freq), and every merge iteration
  * after that touches only the vocabulary — at 100 TB the corpus pass is a
  * single map-side-combining groupBy and the iterative part runs on a
  * table millions of times smaller — and when that dictionary is itself
  * model-sized (every real-world vocabulary), it collects to the driver
  * and trains with ZERO further Spark jobs ([[trainBpeLocal]], gated like
  * the union-find collect in [[Dedup]]). Above the gate, each distributed
  * round is:
  *
  *   1. adjacent-pair counts over the dict (explode + partial-agg sum);
  *   2. a model-sized top-candidates collect (the merges ARE the model);
  *   3. a driver-side selection of the longest batch of merges PROVABLY
  *      equivalent to sequential application ([[safeBatchPrefix]]);
  *   4. ONE map-only rewrite of the symbol column applying the whole
  *      batch (an `aggregate` fold), pinned via [[graft.core.Ckpt.pin]]
  *      so the loop's lineage stays a leaf and pairStats never recomputes
  *      prior rounds (same discipline as [[Dedup.connectedComponents]]).
  *
  * Driver round-trips therefore scale with ROUNDS, not merges — the fix
  * for the one-job-per-merge scheduling cost a 32k-merge production
  * vocabulary would otherwise pay.
  *
  * Deviations from the reference implementation, both deterministic and
  * SQL-replayable (the driver oracle replays the full merge loop in
  * DuckDB, one unrolled SQL block per iteration — see q_bpe_train_docs):
  *
  *   - tie-break on equal pair counts is (s1 asc, s2 asc) rather than
  *     Python dict insertion order;
  *   - merge application is the simultaneous left-to-right non-overlapping
  *     rewrite (what `str.replace` does in the published code): in a run
  *     of overlapping occurrences ("aaa" under ("a","a")) the 1st, 3rd, …
  *     occurrences merge.
  *
  * Tokenization ([[tokenize]]) is dictionary-driven too: distinct words
  * are tokenized once by a local per-word kernel (rank-ordered merge
  * passes), then joined back onto the corpus positions — the corpus-sized
  * pass is one join + one per-doc reassembly, never a per-occurrence
  * merge loop.
  */
object Bpe {

  /** End-of-word marker appended to every word's symbol sequence, so
    * word-final subwords are distinct from word-internal ones (the
    * published algorithm's `</w>`). */
  val Eow = "</w>"

  /** (word, freq) dictionary — the one corpus-sized scan. Words come from
    * the shared whitespace tokenization ([[Dedup.tokens]]: trim + lower). */
  def wordFreqs(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(Dedup.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbol sequence of a word: its characters plus [[Eow]].
    * (`split(w, "")` emits a trailing empty string on some JDK regex
    * versions — filtered defensively.) */
  def initialSymbols(word: Column): Column =
    concat(filter(split(word, ""), c => c =!= ""), array(lit(Eow)))

  /** The trainable state: (word, freq, syms). */
  def initialDict(docs: DataFrame, textCol: String = "text"): DataFrame =
    wordFreqs(docs, textCol).withColumn("syms", initialSymbols(col("word")))

  /** Adjacent-pair counts over the dict, weighted by word frequency:
    * (s1, s2, cnt). Every position counts, including overlapping
    * occurrences — the published counting rule. */
  def pairStats(dict: DataFrame): DataFrame =
    dict.select(col("freq"),
        explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("s1"), b.as("s2")))).as("p"))
      .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(sum("freq").as("cnt"))

  /** One simultaneous left-to-right merge pass of (a, b) → a+b over a
    * symbol array, as a fold: append each symbol, merging it into the
    * previously-appended one when they form the pair. A merged token can
    * never re-merge in the same pass (a+b ≠ a for nonempty b), so the
    * fold IS the non-overlapping left-to-right rewrite —
    * property-tested equivalent to the imperative kernel in
    * [[applyMergesLocal]]. try_element_at: null on the empty
    * accumulator (ANSI-safe), which fails the merge condition. */
  def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(try_element_at(acc, lit(-1)) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** One simultaneous left-to-right pass applying a SET of merges whose
    * inputs are pairwise disjoint (see [[safeBatchPrefix]] for the exact
    * precondition). At most one rule can fire at any position, no merged
    * token can feed another rule in the same pass (guaranteed by the
    * batch-selection conditions), so the pass is order-independent and
    * equals applying the merges one [[mergePair]] pass each. */
  def mergePairsBatch(syms: Column, pairs: Seq[(String, String)]): Column = {
    require(pairs.nonEmpty, "empty merge batch")
    aggregate(syms, array().cast("array<string>"), (acc, s) => {
      val last = try_element_at(acc, lit(-1))
      val head = pairs.head
      val mergedTok = pairs.tail.foldLeft(
        when(last === lit(head._1) && s === lit(head._2), lit(head._1 + head._2))
      ) { case (w, (a, b)) => w.when(last === lit(a) && s === lit(b), lit(a + b)) }
      when(mergedTok.isNotNull,
        concat(slice(acc, lit(1), size(acc) - 1), array(mergedTok)))
        .otherwise(concat(acc, array(s)))
    })
  }

  /** Unsigned UTF-8 byte comparison — Spark's string ordering
    * (UTF8String.compareTo) and DuckDB's default collation, used so the
    * driver-local trainer tie-breaks BIT-IDENTICALLY to the distributed
    * `orderBy(s1, s2)` path (Java String.compareTo differs on
    * supplementary characters). */
  private[graft] def utf8Compare(x: String, y: String): Int = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** Longest prefix of the (cnt desc, s1, s2)-sorted candidate list that is
    * PROVABLY equivalent to applying the candidates sequentially — the
    * batching real BPE trainers use, restricted to the exactly-safe case:
    *
    *   1. CONTIGUOUS prefix (no skipping): every non-batch pair sorts
    *      after the whole batch, so count decrements (old pairs only ever
    *      LOSE occurrences to a merge) cannot promote one past a batch
    *      member.
    *   2. Pairwise disjoint: for i ≠ j, {si1,si2} ∩ {sj1,sj2} = ∅ and
    *      neither merged token si1+si2 equals an input symbol of the
    *      other. Then merges commute, touch disjoint positions, never
    *      create or destroy each other's occurrences, and never cascade
    *      inside one [[mergePairsBatch]] pass.
    *   3. A self-pair (s1 == s2) ends the batch at itself: its new pairs
    *      (s1, s1s1) are bounded only by its OWN count, which can exceed
    *      later candidates'.
    *   4. Strict count drop after the batch (`nextCnt`): every pair
    *      created by a batch merge maps occurrence-for-occurrence into an
    *      old pair sharing a symbol with the batch — by (1)+(2) such a
    *      pair is outside the batch, so its count ≤ nextCnt < the batch
    *      minimum. New pairs therefore never outrank a pending batch
    *      member at any intermediate sequential step. A 1-element batch
    *      IS the sequential argmax and needs no guard.
    *
    * `nextCnt` = count of the first candidate after the available list,
    * or None when the list is COMPLETE and fully consumed (then no
    * outside pair exists and the guard is vacuous). */
  private[graft] def safeBatchPrefix(cands: Seq[(String, String, Long)],
      nextCntOf: Int => Option[Long]): Seq[(String, String, Long)] = {
    if (cands.isEmpty) return Nil
    val taken = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    val inputs = scala.collection.mutable.Set.empty[String]
    val tokens = scala.collection.mutable.Set.empty[String]
    var stop = false
    for (c @ (a, b, _) <- cands if !stop) {
      val tok = a + b
      val disjoint = !inputs(a) && !inputs(b) && !tokens(a) && !tokens(b) &&
        !inputs(tok)
      if (!disjoint) stop = true
      else {
        taken += c
        inputs += a; inputs += b; tokens += tok
        if (a == b) stop = true // condition 3
      }
    }
    // condition 4: shrink until the batch minimum strictly beats the first
    // excluded candidate (k = 1 is exact by construction).
    var k = taken.length
    while (k > 1 && !nextCntOf(k).forall(taken(k - 1)._3 > _)) k -= 1
    taken.take(k).toSeq
  }

  /** Default driver-local training gate: dictionaries at or below this
    * many distinct words collect to the driver (≈ tens of MB — the same
    * model-sized-state discipline as [[Dedup]]'s ≤1M-edge union-find
    * gate). Real-world web-corpus vocabularies at any scale land well
    * under it; above the gate the distributed batched loop runs. */
  val LocalDictMaxWords: Long = 2000000L

  /** Train `numMerges` merges. Stops early when the best remaining pair
    * occurs fewer than `minCount` times. The returned merge list is the
    * model (numMerges rows — model-sized driver state).
    *
    * Two production-vocabulary paths, both bit-identical to the published
    * sequential algorithm (property-tested in BpeSpec):
    *
    *   - dict ≤ `localDictMaxWords` distinct words → ONE distributed scan
    *     builds (word, freq), then [[trainBpeLocal]] trains on the driver
    *     with incremental pair-count maintenance — a 32k-merge vocabulary
    *     costs zero further Spark jobs instead of 32k sequential ones.
    *   - above the gate → distributed loop, but each round collects the
    *     top `batchLimit + 1` candidates and applies the provably-safe
    *     prefix ([[safeBatchPrefix]]) in ONE rewrite pass, so driver
    *     round-trips scale with rounds, not merges. */
  def trainBpe(docs: DataFrame, numMerges: Int, textCol: String = "text",
      minCount: Long = 2L, localDictMaxWords: Long = LocalDictMaxWords,
      batchLimit: Int = 64): Seq[BpeMerge] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    require(batchLimit >= 1, "batchLimit must be >= 1")
    val wf = graft.core.Ckpt.pin(wordFreqs(docs, textCol))
    if (wf.count() <= localDictMaxWords) {
      val local = wf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      return trainBpeLocal(local, numMerges, minCount)
    }
    var dict = wf.withColumn("syms", initialSymbols(col("word")))
    val merges = Seq.newBuilder[BpeMerge]
    var r = 1L
    var done = false
    while (r <= numMerges && !done) {
      val lim = math.min(batchLimit.toLong, numMerges - r + 1).toInt
      val cands = pairStats(dict)
        .orderBy(col("cnt").desc, col("s1"), col("s2")).limit(lim + 1).collect()
        .map(row => (row.getString(0), row.getString(1), row.getLong(2))).toSeq
      val eligible = cands.take(lim).takeWhile(_._3 >= minCount)
      if (eligible.isEmpty) done = true
      else {
        val batch = safeBatchPrefix(eligible,
          k => if (cands.length > k) Some(cands(k)._3) else None)
        batch.foreach { case (a, b, cnt) => merges += BpeMerge(r, a, b, cnt); r += 1 }
        dict = graft.core.Ckpt.pin(dict.withColumn("syms",
          mergePairsBatch(col("syms"), batch.map(c => (c._1, c._2)))))
      }
    }
    merges.result()
  }

  private val bpeOrd: Ordering[(Long, String, String)] =
    new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        if (x._1 != y._1) java.lang.Long.compare(y._1, x._1) // cnt desc
        else {
          val c = utf8Compare(x._2, y._2)
          if (c != 0) c else utf8Compare(x._3, y._3)
        }
      }
    }

  /** Driver-local trainer over a collected (word, freq) dictionary —
    * bit-identical to the distributed loop: same (cnt desc, s1, s2)
    * UTF-8-binary tie-break, same simultaneous left-to-right rewrite,
    * same minCount stop. Incremental: pair counts live in a map mirrored
    * by a (cnt desc, s1, s2) tree for O(log P) argmax, and each merge
    * re-pairs only the words that actually contain it (an append-only
    * occurrence index, deduplicated and containment-checked at use — the
    * structure real tokenizer trainers use). O(touched · log P) per
    * merge: a 32k-merge vocabulary trains in seconds. */
  def trainBpeLocal(wordFreqs: Seq[(String, Long)], numMerges: Int,
      minCount: Long = 2L): Seq[BpeMerge] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    import scala.collection.mutable
    val words: Array[Array[String]] =
      wordFreqs.map { case (w, _) => w.map(_.toString).toArray :+ Eow }.toArray
    val freqs: Array[Long] = wordFreqs.map(_._2).toArray
    val counts = mutable.HashMap.empty[(String, String), Long]
    val sorted = mutable.TreeSet.empty[(Long, String, String)](bpeOrd)
    val where = mutable.HashMap.empty[(String, String), mutable.ArrayBuffer[Int]]
    def setCount(p: (String, String), c: Long): Unit = {
      counts.get(p).foreach(old => sorted.remove((old, p._1, p._2)))
      if (c == 0L) counts.remove(p)
      else { counts(p) = c; sorted.add((c, p._1, p._2)) }
    }
    def pairsOf(syms: Array[String]): Array[(String, String)] =
      Array.tabulate(math.max(syms.length - 1, 0))(i => (syms(i), syms(i + 1)))
    for (i <- words.indices; p <- pairsOf(words(i))) {
      setCount(p, counts.getOrElse(p, 0L) + freqs(i))
      where.getOrElseUpdate(p, mutable.ArrayBuffer.empty) += i
    }
    val merges = Seq.newBuilder[BpeMerge]
    var r = 1L
    var done = false
    while (r <= numMerges && !done) {
      if (sorted.isEmpty || sorted.head._1 < minCount) done = true
      else {
        val (cnt, a, b) = sorted.head
        merges += BpeMerge(r, a, b, cnt)
        val occ = where.remove((a, b)).getOrElse(mutable.ArrayBuffer.empty)
        occ.distinct.foreach { i =>
          val before = words(i)
          val after = mergeOnce(before, a, b)
          if (after.length != before.length) { // containment check: stale index entries no-op
            val f = freqs(i)
            pairsOf(before).foreach(p => setCount(p, counts.getOrElse(p, 0L) - f))
            val afterPairs = pairsOf(after)
            afterPairs.foreach(p => setCount(p, counts.getOrElse(p, 0L) + f))
            val beforeSet = pairsOf(before).toSet
            afterPairs.toSet.diff(beforeSet).foreach(p =>
              where.getOrElseUpdate(p, mutable.ArrayBuffer.empty) += i)
            words(i) = after
          }
        }
        r += 1
      }
    }
    merges.result()
  }

  /** One simultaneous left-to-right non-overlapping (a, b) → a+b rewrite
    * of a symbol array — the imperative twin of [[mergePair]]. */
  def mergeOnce(syms: Array[String], a: String, b: String): Array[String] = {
    if (syms.length < 2) return syms
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Local per-word kernel: apply the merge list in rank order, each pass
    * the simultaneous left-to-right rewrite. O(len · numMerges); runs once
    * per DISTINCT word. */
  def applyMergesLocal(word: String, merges: Seq[(String, String)]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray :+ Eow
    merges.foreach { case (a, b) => syms = mergeOnce(syms, a, b) }
    syms
  }

  /** Tokenize a corpus with a trained merge list: (idCol, bpe_tokens).
    * Distinct words tokenize once (local kernel, merges broadcast in the
    * closure), then join back onto corpus word positions; per-doc
    * reassembly sorts by position inside a single aggregation. The
    * vocabulary join is an ordinary dimension join — AQE broadcasts it
    * when the vocab is small. Docs with no words are absent from the
    * output (matches the oracle's inner join). */
  def tokenize(docs: DataFrame, merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(explode(Dedup.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0).distinct()
    val bc = spark.sparkContext.broadcast(merges.toIndexedSeq)
    val wordToks = words.as[String]
      .mapPartitions { it => val m = bc.value; it.map(w => (w, applyMergesLocal(w, m))) }
      .toDF("word", "toks")
    docs
      .select(col(idCol), posexplode(Dedup.tokens(col(textCol))).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
      .join(wordToks, "word")
      .groupBy(idCol)
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("toks")))),
        x => x("toks"))).as("bpe_tokens"))
  }

  /** Tokenizer fertility / compression statistics — the standard
    * public tokenizer-evaluation metrics (tokens-per-word "fertility"
    * and characters-per-token compression; a vocabulary that fits the
    * corpus poorly shows fertility ≫ 1 and low chars/token, and the
    * numbers drive vocab-size / training-corpus decisions). Per doc:
    * (n_words, n_bpe_tokens, n_chars, fertility, chars_per_token).
    *
    * Same plan shape as [[tokenize]] minus the token materialization:
    * DISTINCT words run the local merge kernel once, per-word counts
    * join back onto word occurrences (gram-keyed), one doc rollup. */
  def fertilityStats(docs: DataFrame, merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(explode(Dedup.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0).distinct()
    val bc = spark.sparkContext.broadcast(merges.toIndexedSeq)
    val wordStats = words.as[String]
      .mapPartitions { it =>
        val m = bc.value
        it.map(w => (w, applyMergesLocal(w, m).length.toLong, w.length.toLong))
      }
      .toDF("word", "n_toks", "n_chars")
    docs
      .select(col(idCol).as("doc_id"), explode(Dedup.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .join(wordStats, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_toks").as("n_bpe_tokens"),
        sum("n_chars").as("n_chars"))
      .withColumn("fertility",
        col("n_bpe_tokens").cast("double") / col("n_words"))
      .withColumn("chars_per_token",
        col("n_chars").cast("double") / col("n_bpe_tokens"))
  }
}
