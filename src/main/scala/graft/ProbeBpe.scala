package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE training scale probe: the operator's 100 TB claim is that after the
  * one corpus-sized word-frequency scan, every merge iteration touches only
  * the VOCABULARY — so growing the corpus at fixed vocabulary must grow
  * only the scan, while the per-iteration cost tracks the dict size.
  *
  * The driver documents table is useless for this (its generator draws
  * from ~31 distinct words), so the probe synthesizes its corpus:
  * `nWords` word slots per row filled from a `vocab`-sized id space, each
  * id rendered as an 8-hex-char word (md5 prefix — 16-symbol alphabet
  * keeps pair cardinality realistic). Grid:
  *
  *   A  vocab 10k, 1M words   — baseline
  *   B  vocab 10k, 10M words  — 10× corpus, same vocab: dict build may
  *                              grow, iterations must NOT
  *   C  vocab 100k, 10M words — 10× vocab at B's corpus: iterations may
  *                              grow with vocab (that's the honest axis)
  */
object ProbeBpe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.Bpe

    val wordsPerDoc = 100

    def corpus(nDocs: Long, vocab: Long) =
      spark.range(nDocs).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(wordsPerDoc)),
          i => substring(md5(
            ((col("id") * wordsPerDoc + i) % vocab).cast("string")), 1, 8)))
          .as("text"))

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    def trainTimed(label: String, nDocs: Long, vocab: Long): Unit = {
      Bench.resetStorage(spark)
      val c = corpus(nDocs, vocab)
      c.count() // isolate generation warm-up from the measured passes
      val (dict0, tDict) = timed(graft.core.Ckpt.pin(Bpe.initialDict(c)))
      val nVocab = dict0.count()
      val (_, tIters) = timed {
        var dict = dict0
        (1 to 8).foreach { _ =>
          val top = Bpe.pairStats(dict)
            .orderBy(col("cnt").desc, col("s1"), col("s2")).limit(1).collect()
          val a = top(0).getString(0); val b = top(0).getString(1)
          dict = graft.core.Ckpt.pin(
            dict.withColumn("syms", Bpe.mergePair(col("syms"), a, b)))
        }
      }
      println(f"$label%-26s words=${nDocs * wordsPerDoc}%9d vocab=$nVocab%7d  " +
        f"dict_build=$tDict%6.2fs  8_iters=$tIters%6.2fs  per_iter=${tIters / 8}%5.2fs")
    }

    trainTimed("A_vocab10k_1Mwords", 10000L, 10000L)
    trainTimed("B_vocab10k_10Mwords", 100000L, 10000L)
    trainTimed("C_vocab100k_10Mwords", 100000L, 100000L)

    // ---- production-vocabulary axis (round 8) ----------------------------
    // D: the production API at C's corpus — the dict gates LOCAL, so wall
    // = one corpus scan + collect + in-memory training. Sublinear in merge
    // count: the scan dominates and the incremental trainer is
    // O(touched·log P) per merge.
    println("\nD: trainBpe (local gate) wall vs merge count, vocab 100k, 10M words")
    val cD = corpus(100000L, 100000L)
    cD.count()
    for (m <- Seq(125, 250, 500, 1000, 2000)) {
      Bench.resetStorage(spark)
      val (merges, t) = timed(Bpe.trainBpe(cD, m, minCount = 1L))
      println(f"  merges=$m%5d  wall=$t%6.2fs  per_merge=${t / m * 1000}%7.2fms  got=${merges.length}")
    }

    // E: the above-gate distributed loop — batched (64) vs sequential (1)
    // round-trips at 64 merges. The batch is the provably-sequential-
    // equivalent prefix, so results are identical; wall shows the
    // scheduling cost the batching removes.
    println("\nE: distributed loop, batchLimit 64 vs 1, 64 merges, vocab 100k")
    for (bl <- Seq(1, 64)) {
      Bench.resetStorage(spark)
      val (merges, t) = timed(
        Bpe.trainBpe(cD, 64, minCount = 1L, localDictMaxWords = 0L, batchLimit = bl))
      println(f"  batchLimit=$bl%3d  wall=$t%6.2fs  merges=${merges.length}")
    }
    spark.stop()
  }
}
