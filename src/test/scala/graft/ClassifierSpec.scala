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

  test("calibrationBins: hand-checked bins; ECE matches the weighted sum") {
    val scored = Seq((1L, 0.05), (2L, 0.15), (3L, 0.95), (4L, 0.85), (5L, 1.0))
      .toDF("doc_id", "prob")
    val labels = Seq((1L, 0), (2L, 1), (3L, 1), (4L, 1), (5L, 1))
      .toDF("doc_id", "y")
    val bins = Classifier.calibrationBins(scored, labels, nBins = 10)
    val m = bins.collect().map(r => r.getAs[Long]("bin") ->
      (r.getAs[Long]("n"), r.getAs[Double]("confidence"),
        r.getAs[Double]("accuracy"))).toMap
    // prob 1.0 clamps into the last bin; bins 0,1,8,9 populated
    assert(m(0L) == (1L, 0.05, 0.0) && m(1L) == (1L, 0.15, 1.0), s"got $m")
    assert(m(8L) == (1L, 0.85, 1.0), s"got $m")
    assert(m(9L)._1 == 2L && math.abs(m(9L)._2 - 0.975) < 1e-9 &&
      m(9L)._3 == 1.0, s"got $m")
    val ece = Classifier.expectedCalibrationError(bins).collect()(0)
    // sum n*|conf-acc| = 1*0.05 + 1*0.85 + 1*0.15 + 2*0.025 = 1.10 -> /5
    assert(math.abs(ece.getAs[Double]("ece") - 0.22) < 1e-9, s"got $ece")
    assert(ece.getAs[Long]("n_total") == 5L)
    intercept[IllegalArgumentException](
      Classifier.calibrationBins(scored, labels, nBins = 0))
  }

  test("agreementKappa: hand-computed kappa; constant-identical labelings are null") {
    // 10 items: a and b agree on 8; marginals a: 6 x / 4 o, b: 6 x / 4 o
    val a = (1L to 10L).map(i => (i, if (i <= 6) "x" else "o")).toDF("doc_id", "label")
    val b = (1L to 10L).map(i =>
      (i, if (i <= 5 || i == 7) "x" else "o")).toDF("doc_id", "label")
    val r = Classifier.agreementKappa(a, b).collect()(0)
    // po = 8/10; pe = 0.6*0.6 + 0.4*0.4 = 0.52; kappa = 0.28/0.48
    assert(r.getAs[Double]("po") == 0.8 && r.getAs[Double]("pe") == 0.52, s"got $r")
    assert(math.abs(r.getAs[Double]("kappa") - 0.583333) < 1e-9, s"got $r")
    assert(r.getAs[Long]("n") == 10L)
    val const = (1L to 4L).map(i => (i, "same")).toDF("doc_id", "label")
    val rc = Classifier.agreementKappa(const, const).collect()(0)
    assert(rc.getAs[Double]("po") == 1.0 && rc.getAs[Double]("pe") == 1.0 &&
      rc.isNullAt(rc.fieldIndex("kappa")), s"got $rc")
  }

  test("perClassMetrics: hand-computed P/R/F1 incl. predicted-only and no-support classes") {
    val pred = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (5L, "c"),
      (6L, "a"), (7L, "d")).toDF("doc_id", "label")
    val truth = Seq((1L, "a"), (2L, "b"), (3L, "b"), (4L, "c"), (5L, "c"),
      (6L, "c"), (7L, "a")).toDF("doc_id", "label")
    val rows = Classifier.perClassMetrics(pred, truth).collect().map { r =>
      r.getAs[String]("cls") -> (r.getAs[Long]("support"), r.getAs[Long]("n_pred"),
        r.getAs[Long]("tp"),
        Option(r.getAs[java.lang.Double]("precision")).map(_.doubleValue),
        Option(r.getAs[java.lang.Double]("recall")).map(_.doubleValue),
        Option(r.getAs[java.lang.Double]("f1")).map(_.doubleValue))
    }.toMap
    // a: tp 1, pred 3, support 2 -> p .333333, r .5, f1 .4 (canonized)
    assert(rows("a") == (2L, 3L, 1L, Some(0.333333), Some(0.5), Some(0.4)), s"got $rows")
    assert(rows("b") == (2L, 2L, 1L, Some(0.5), Some(0.5), Some(0.5)))
    // c: tp 1, pred 1, support 3 -> p 1.0, r .333333, f1 .5 (canonized)
    assert(rows("c") == (3L, 1L, 1L, Some(1.0), Some(0.333333), Some(0.5)))
    // d: predicted once, never true -> p 0, recall/f1 null
    assert(rows("d") == (0L, 1L, 0L, Some(0.0), None, None))
    // class ordering is lexicographic
    val order = Classifier.perClassMetrics(pred, truth)
      .collect().map(_.getAs[String]("cls")).toSeq
    assert(order == Seq("a", "b", "c", "d"))
  }

  test("rocAuc: perfect separation, tie half-credit, reversal, empty class") {
    import spark.implicits._
    def auc(rows: Seq[(Long, Double, Boolean)]): Option[Double] = {
      val r = Classifier.rocAuc(rows.toDF("id", "s", "y"), "y", "s", "id").collect()(0)
      Option(r.getAs[java.lang.Double]("auc")).map(_.doubleValue)
    }
    // positives strictly above negatives
    assert(auc(Seq((1L, 3.0, true), (2L, 4.0, true),
      (3L, 1.0, false), (4L, 2.0, false))) == Some(1.0))
    // tie at score 2: pair credit (0.5 + 1 + 0 + 1)/4 = 0.625
    assert(auc(Seq((1L, 2.0, true), (2L, 1.0, true),
      (3L, 2.0, false), (4L, 0.0, false))) == Some(0.625))
    // reversed scores: 0.0
    assert(auc(Seq((1L, 1.0, true), (2L, 2.0, false))) == Some(0.0))
    // single-class input: undefined
    assert(auc(Seq((1L, 1.0, true), (2L, 2.0, true))) == None)
    // null score rows are dropped, not counted in either class
    val withNull = Seq((1L, Option(3.0), true), (2L, Option.empty[Double], true),
      (3L, Option(1.0), false)).toDF("id", "s", "y")
    val r = Classifier.rocAuc(withNull, "y", "s", "id").collect()(0)
    assert(r.getAs[Long]("n_pos") == 1L && r.getAs[Double]("auc") == 1.0)
  }
}
