package graft

import graft.ext.{Classifier, LogisticModel}
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def kr(s: String): Long =
    s.foldLeft(0L)((h, c) => (h * 257 + c.toInt) % 1000000007L)

  test("hashedCounts: KR bucket mod dim, counts per (doc, bucket), empty docs absent") {
    val docs = Seq((1L, "ab ab xy"), (2L, ""), (3L, "ab")).toDF("doc_id", "text")
    val out = Classifier.hashedCounts(docs, dim = 8)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bucket"),
        r.getAs[Double]("cnt"))).toSet
    val bAb = kr("ab") % 8
    val bXy = kr("xy") % 8
    assert(out == Set((1L, bAb, 2.0), (1L, bXy, 1.0), (3L, bAb, 1.0)), s"got $out")
  }

  test("trainLogistic separates planted classes and quantizes weights") {
    val docs = ((0 until 20).map(i => (i.toLong, "aaa aaa common", 1)) ++
      (20 until 40).map(i => (i.toLong, "bbb bbb common", 0)))
      .toDF("doc_id", "text", "y")
    val m = Classifier.trainLogistic(docs, "y", dim = 16, iters = 2, lr = 0.5)
    assert(m.w.forall(v => v == math.floor(v * 1e6 + 0.5) / 1e6), "weights not 1e-6 quantized")
    val scores = Classifier.scoreDocs(docs, m)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("margin")).toMap
    assert(scores(0L) > 0 && scores(25L) < 0,
      s"no separation: pos=${scores(0L)} neg=${scores(25L)}")
    // deterministic: retraining yields the identical weight vector
    val m2 = Classifier.trainLogistic(docs, "y", dim = 16, iters = 2, lr = 0.5)
    assert(m.w.sameElements(m2.w))
  }

  test("scoreDocs margin equals the hand-computed dot product") {
    val w = Array.fill(8)(0.0)
    val bAb = (kr("ab") % 8).toInt
    val bXy = (kr("xy") % 8).toInt
    w(bAb) = 0.25; w(bXy) = -1.0
    val docs = Seq((1L, "ab ab xy")).toDF("doc_id", "text")
    val out = Classifier.scoreDocs(docs, LogisticModel(8, w)).collect()(0)
    val expected = 2 * 0.25 - 1.0
    assert(out.getAs[Double]("margin") == expected)
    assert(math.abs(out.getAs[Double]("prob") - 1.0 / (1.0 + math.exp(-expected))) < 1e-15)
  }

  test("filterByScore keeps only docs at or above the probability threshold") {
    val docs = ((0 until 5).map(i => (i.toLong, "aaa aaa", 1)) ++
      (5 until 10).map(i => (i.toLong, "bbb bbb", 0))).toDF("doc_id", "text", "y")
    val m = Classifier.trainLogistic(docs, "y", dim = 16, iters = 3, lr = 1.0)
    val kept = Classifier.filterByScore(docs, m, threshold = 0.5)
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(kept.sameElements(Array(0L, 1L, 2L, 3L, 4L)), s"got ${kept.toSeq}")
  }
}
