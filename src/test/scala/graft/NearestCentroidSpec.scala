package graft

import graft.ext.NearestCentroid

class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  private def labeled = Seq(
    (1L, Some(0L), Seq(1.0, 0.0)),
    (2L, Some(0L), Seq(0.5, 0.5)),
    (3L, Some(1L), Seq(0.0, 1.0)),
    (4L, None, Seq(0.9, 0.1))            // unlabeled: classified, never fitted
  ).toDF("vec_id", "label", "embedding")

  test("labelCentroids: hand-computed per-label means; null labels excluded") {
    val c = NearestCentroid.labelCentroids(labeled)
      .collect().map(r => r.getAs[Long]("label") ->
        (r.getAs[collection.Seq[Double]]("centroid"), r.getAs[Long]("n_members"))).toMap
    assert(c(0L)._1 == Seq(0.75, 0.25) && c(0L)._2 == 2L, s"got $c")
    assert(c(1L)._1 == Seq(0.0, 1.0) && c(1L)._2 == 1L, s"got $c")
    assert(c.size == 2)
  }

  test("classify: hand-computed cosine and argmax; unlabeled rows get predictions") {
    val out = NearestCentroid.classify(labeled,
        NearestCentroid.labelCentroids(labeled))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("predicted"), r.getAs[Double]("cos"))).toMap
    // vec 1 = (1,0) vs centroid0 (0.75,0.25): 0.75/sqrt(0.625) = 0.94868...
    assert(out(1L)._1 == 0L && math.abs(out(1L)._2 - 0.948683) < 1e-9, s"got $out")
    assert(out(3L)._1 == 1L && math.abs(out(3L)._2 - 1.0) < 1e-9, s"got $out")
    assert(out(4L)._1 == 0L, s"unlabeled vec should classify to 0: $out")
    assert(out.size == 4)
  }

  test("exact tie breaks to the smaller label") {
    val emb = Seq(
      (1L, 1L, Seq(1.0, 0.0)),
      (2L, 2L, Seq(0.0, 1.0)),
      (9L, 2L, Seq(1.0, 1.0))            // cos 1/sqrt(2) to BOTH centroids
    ).toDF("vec_id", "label", "embedding")
    // fit on the two pure vectors only, classify all three
    val cents = NearestCentroid.labelCentroids(emb.filter($"vec_id" < 9))
    val out = NearestCentroid.classify(emb, cents)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("predicted")).toMap
    assert(out(9L) == 1L, s"tie must break to label 1: $out")
  }

  test("confusionMatrix and accuracy on separable data") {
    val cm = NearestCentroid.confusionMatrix(labeled)
      .collect().map(r => (r.getAs[Long]("label"), r.getAs[Long]("predicted")) ->
        r.getAs[Long]("n")).toMap
    assert(cm == Map((0L, 0L) -> 2L, (1L, 1L) -> 1L), s"got $cm")
    val acc = NearestCentroid.accuracy(labeled).collect()(0)
    assert(acc.getAs[Double]("accuracy") == 1.0 && acc.getAs[Long]("n") == 3L)
  }

  test("classify without a label column emits (vec_id, predicted, cos)") {
    val cents = NearestCentroid.labelCentroids(labeled)
    val out = NearestCentroid.classify(
      labeled.select($"vec_id", $"embedding"), cents)
    assert(out.columns.toSeq == Seq("vec_id", "predicted", "cos"))
    assert(out.count() == 4)
  }

  test("null embeddings are dropped everywhere") {
    val emb = Seq(
      (1L, Some(0L), Some(Seq(1.0, 0.0))),
      (2L, Some(0L), None)
    ).toDF("vec_id", "label", "embedding")
    assert(NearestCentroid.labelCentroids(emb).collect()
      .head.getAs[collection.Seq[Double]]("centroid") == Seq(1.0, 0.0))
    assert(NearestCentroid.classify(emb,
      NearestCentroid.labelCentroids(emb)).count() == 1)
  }
}
