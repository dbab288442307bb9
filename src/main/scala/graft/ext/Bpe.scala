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
  * table millions of times smaller. Each iteration is:
  *
  *   1. adjacent-pair counts over the dict (explode + partial-agg sum);
  *   2. a 1-row argmax collect (the merge IS the model — model-sized by
  *      definition);
  *   3. a map-only rewrite of the symbol column (an `aggregate` fold),
  *      pinned via [[graft.core.Ckpt.pin]] so the loop's lineage stays a
  *      leaf and pairStats never recomputes prior rounds (same discipline
  *      as [[Dedup.connectedComponents]]).
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

  /** Train `numMerges` merges. Stops early when the best remaining pair
    * occurs fewer than `minCount` times. The returned merge list is the
    * model (numMerges rows — model-sized driver state). */
  def trainBpe(docs: DataFrame, numMerges: Int, textCol: String = "text",
      minCount: Long = 2L): Seq[BpeMerge] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    var dict = graft.core.Ckpt.pin(initialDict(docs, textCol))
    val merges = Seq.newBuilder[BpeMerge]
    var r = 1L
    var done = false
    while (r <= numMerges && !done) {
      val top = pairStats(dict)
        .orderBy(col("cnt").desc, col("s1"), col("s2")).limit(1).collect()
      if (top.isEmpty || top(0).getAs[Long]("cnt") < minCount) done = true
      else {
        val a = top(0).getAs[String]("s1")
        val b = top(0).getAs[String]("s2")
        merges += BpeMerge(r, a, b, top(0).getAs[Long]("cnt"))
        dict = graft.core.Ckpt.pin(
          dict.withColumn("syms", mergePair(col("syms"), a, b)))
        r += 1
      }
    }
    merges.result()
  }

  /** Local per-word kernel: apply the merge list in rank order, each pass
    * the simultaneous left-to-right rewrite. O(len · numMerges); runs once
    * per DISTINCT word. */
  def applyMergesLocal(word: String, merges: Seq[(String, String)]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray :+ Eow
    merges.foreach { case (a, b) =>
      if (syms.length >= 2) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toArray
      }
    }
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
}
