package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Unigram-LM training scale probe: the operator's 100 TB claim is that
  * after the one corpus-sized word-frequency scan, seeding explodes the
  * DICT (distinct words × ≤ len·maxPieceLen substrings) and every EM
  * round runs per-word lattice kernels over the dict with a model-sized
  * expected-count shuffle — so growing the corpus at fixed vocabulary
  * must grow only the scan, while seed + EM track the dict size.
  *
  * Same synthetic recipe as [[ProbeBpe]] (8-hex-char words from a
  * bounded id space). Grid:
  *
  *   A  vocab 10k, 1M words   — baseline
  *   B  vocab 10k, 10M words  — 10× corpus, same vocab: dict build may
  *                              grow, seed/EM must NOT
  *   C  vocab 100k, 10M words — 10× vocab at B's corpus: seed/EM may
  *                              grow with vocab (the honest axis)
  */
object ProbeUnigram {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.{Bpe, Unigram}

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

    def run(label: String, nDocs: Long, vocab: Long): Unit = {
      Bench.resetStorage(spark)
      val c = corpus(nDocs, vocab)
      c.count()
      val (dict, tDict) = timed {
        val d = graft.core.Ckpt.pin(Bpe.wordFreqs(c)); d.count(); d
      }
      val nWords = dict.count()
      val (lp0, tSeed) = timed {
        Unigram.seedLogProbs(Unigram.seedVocabFromDict(dict, maxPieceLen = 4, maxMulti = 2000))
      }
      val (_, tEm) = timed {
        val (counts, _) = Unigram.eStep(dict, lp0, 4)
        val total = counts.values.sum
        counts.collect { case (p, cc) if cc > 0.0 => p -> math.log(cc / total) }
      }
      val (_, tTok) = timed {
        Unigram.tokenize(c, lp0).agg(sum("n_uni_tokens")).collect()
      }
      println(f"[probe-unigram] $label%-28s dictWords=$nWords%7d " +
        f"dict=$tDict%6.2fs seed=$tSeed%6.2fs em1=$tEm%6.2fs tokenize=$tTok%6.2fs")
    }

    run("A vocab=10k words=1M", 10000L, 10000L)
    run("B vocab=10k words=10M", 100000L, 10000L)
    run("C vocab=100k words=10M", 100000L, 100000L)
    spark.stop()
  }
}
