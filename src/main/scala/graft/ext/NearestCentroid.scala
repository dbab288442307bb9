package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Nearest-centroid (Rocchio) classification over labeled embeddings —
  * the lightweight domain/taxonomy classifier tier of a training-data
  * pipeline: fit one mean vector per label, then assign every corpus
  * vector to its most-cosine-similar centroid. This is the standard
  * "label a web crawl by topic from a small labeled seed" pass
  * (centroids from the seed, one map-side sweep over the corpus).
  *
  * Spark shape, and why it scales:
  *   - centroid fitting is the position-keyed partial-aggregate shape
  *     ([[Similarity.meanPoolEmbeddings]]): posexplode → (label, pos)
  *     avg → array rebuild. No task ever holds more than one (label,
  *     pos) accumulator; the result is L·dim doubles — model-sized;
  *   - classification broadcasts the centroid table and expands each
  *     vector L-fold map-side; the per-vector argmax is a vec-keyed
  *     aggregate whose map-side combine collapses the expansion back to
  *     one row per vector BEFORE the shuffle. Cost: L·N·dim multiply-
  *     adds, embarrassingly parallel. For label spaces too big to
  *     broadcast, switch to the ANN tier ([[Similarity]]/[[Pq]]) with
  *     centroids as the indexed side;
  *   - cosines are 1e-6-canonicalized BEFORE the argmax and ties break
  *     to the smaller label, so the assignment is a function of values
  *     both engines reproduce bit-exactly (the bm25TopK rank rule).
  *
  * Null labels / null embeddings are excluded from fitting and from
  * classification (no centroid to stand on, nothing to score).
  *
  * Reference scope note: the reference engine has no classifier surface;
  * §7.4 LLM-pipeline extension (`DataFrameUtils` has no counterpart).
  */
object NearestCentroid {

  private def quant(c: org.apache.spark.sql.Column) =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Per-label mean vectors: (label, centroid array<double>, n_members). */
  def labelCentroids(emb: DataFrame, labelCol: String = "label",
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    emb.filter(col(labelCol).isNotNull && col(embCol).isNotNull)
      .select(col(labelCol).cast("long").as("label"),
        posexplode(col(embCol).cast("array<double>")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(avg("v").as("m"), count(lit(1)).as("n"))
      .groupBy("label")
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"),
        max("n").as("n_members"))

  /** Assign every vector to its nearest centroid by canonicalized
    * cosine: (vec_id, label?, predicted, cos). `centroids` is a
    * (label, centroid) frame — typically [[labelCentroids]] output,
    * but any externally fitted model-sized table works. */
  def classify(emb: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", embCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val hasLabel = emb.columns.contains(labelCol)
    val base = emb.filter(col(embCol).isNotNull)
      .select(Seq(col(idCol).cast("long").as("vec_id"),
        col(embCol).cast("array<double>").as("emb")) ++
        (if (hasLabel) Seq(col(labelCol).cast("long").as("label")) else Nil): _*)
    val scored = base
      .crossJoin(broadcast(centroids.select(col("label").as("clabel"),
        col("centroid").cast("array<double>").as("cvec"))))
      .withColumn("cos", quant(Dedup.cosine(col("emb"), col("cvec"))))
      .filter(col("cos").isNotNull && !isnan(col("cos")))
    // argmax with the deterministic tie rule: min over (-cos, clabel)
    val picked = scored
      .groupBy("vec_id")
      .agg(min(struct((-col("cos")).as("nc"), col("clabel"), col("cos"))).as("best"))
      .select(col("vec_id"), col("best.clabel").as("predicted"),
        col("best.cos").as("cos"))
    if (hasLabel)
      base.select(col("vec_id"), col("label")).join(picked, "vec_id")
    else picked
  }

  /** Self-classification confusion matrix over a labeled table:
    * (label, predicted, n) — fit on `emb`, classify `emb`. */
  def confusionMatrix(emb: DataFrame, labelCol: String = "label",
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    classify(emb, labelCentroids(emb, labelCol, idCol, embCol),
        idCol, embCol, labelCol)
      .filter(col("label").isNotNull)
      .groupBy("label", "predicted").agg(count(lit(1)).as("n"))

  /** Scalar self-classification accuracy (one row: accuracy, n). */
  def accuracy(emb: DataFrame, labelCol: String = "label",
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    classify(emb, labelCentroids(emb, labelCol, idCol, embCol),
        idCol, embCol, labelCol)
      .filter(col("label").isNotNull)
      .agg(quant(avg(when(col("label") === col("predicted"), 1.0).otherwise(0.0)))
          .as("accuracy"),
        count(lit(1)).as("n"))
}
