package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained hashed-BoW logistic model: weight per feature bucket. */
case class LogisticModel(dim: Int, w: Array[Double])

/** Model-based quality filtering — the lightweight linear-classifier
  * tier public training-data pipelines use to score documents (the
  * fastText classifiers of CCNet §4.4, DataComp's quality baselines,
  * FineWeb-Edu's educational-value filter): logistic regression over
  * feature-hashed token counts, trained here by deterministic FULL-BATCH
  * gradient descent and applied as a map-side scoring pass.
  *
  * Spark shape: the (doc, bucket, cnt) feature frame is built by one
  * corpus pass and Ckpt-pinned; each training iteration is one pass over
  * it — margins via a broadcast join against the model-sized weight
  * table + a doc-keyed aggregate, then a bucket-keyed gradient aggregate
  * whose output is D rows. Driver round-trips scale with ITERATIONS;
  * inference is a broadcast join + one doc-keyed aggregate, no state.
  *
  * Determinism contract (what makes the TRAINER hard-oracle-able, unlike
  * SGD whose result depends on row order): full-batch gradients are
  * order-independent up to float summation noise, and the weight vector
  * is QUANTIZED to 1e-6 after every update — so both engines carry
  * bit-identical models into the next iteration and the unrolled SQL
  * replay matches hash-for-hash (the [[Unigram]] model-quantization
  * lesson applied to a trainer). Token hashing is the replayable
  * Karp–Rabin family ([[TextStats.rollingHash]] mod dim), the same hash
  * the q_hashed_topk oracle already replays. No bias term: the decision
  * threshold plays that role for a filter (documented simplification vs
  * fastText), and λ = 0 (the quantization already bounds drift).
  */
object Classifier {

  /** Feature-hashed token counts: (doc_id, bucket, cnt), bucket =
    * KR-hash(token) mod dim. Docs with no tokens are absent. */
  def hashedCounts(docs: DataFrame, dim: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(Dedup.tokens(col(textCol))).as("t"))
      .filter(length(col("t")) > 0)
      .select(col("doc_id"), pmod(TextStats.rollingHash(col("t")), lit(dim.toLong)).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).cast("double").as("cnt"))

  private def quantize(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Train a logistic model on `docs` with 0/1 labels in `labelCol`:
    * `iters` full-batch GD steps from w = 0 at rate `lr`, the weight
    * vector quantized to 1e-6 after each step. Gradient =
    * Σ_docs (σ(w·x_d) − y_d)·x_d / nDocs with nDocs = |docs| (feature-
    * less docs contribute nothing but still scale the rate — both sides
    * of the oracle count them identically). */
  def trainLogistic(docs: DataFrame, labelCol: String, dim: Int = 64,
      iters: Int = 2, lr: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): LogisticModel = {
    require(iters >= 1, "iters must be >= 1")
    require(dim >= 1, "dim must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = graft.core.Ckpt.pin(hashedCounts(docs, dim, idCol, textCol))
    val labels = docs.select(col(idCol).as("doc_id"),
      col(labelCol).cast("double").as("y"))
    val n = docs.count().toDouble
    var w = Array.fill(dim)(0.0)
    var it = 0
    while (it < iters) {
      val wDf = w.zipWithIndex.map { case (v, b) => (b.toLong, v) }.toSeq
        .toDF("bucket", "wv")
      val margins = feats.join(broadcast(wDf), "bucket")
        .groupBy("doc_id").agg(sum(col("cnt") * col("wv")).as("margin"))
      val grads = feats
        .join(margins, "doc_id")
        .join(labels, "doc_id")
        .withColumn("p", lit(1.0) / (lit(1.0) + exp(-col("margin"))))
        .groupBy("bucket")
        .agg(sum((col("p") - col("y")) * col("cnt")).as("gs"))
        .collect().map(r => r.getAs[Long]("bucket").toInt -> r.getAs[Double]("gs")).toMap
      w = Array.tabulate(dim)(b => quantize(w(b) - lr * grads.getOrElse(b, 0.0) / n))
      it += 1
    }
    LogisticModel(dim, w)
  }

  /** Score a corpus under a trained model: (doc_id, margin, prob) —
    * margin = w·x, prob = σ(margin). Map-side: broadcast weight join +
    * one doc-keyed aggregate. Docs with no tokens are absent (no
    * features ⇒ nothing to score), matching the oracle's inner join. */
  def scoreDocs(docs: DataFrame, model: LogisticModel,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wDf = model.w.zipWithIndex.map { case (v, b) => (b.toLong, v) }.toSeq
      .toDF("bucket", "wv")
    hashedCounts(docs, model.dim, idCol, textCol)
      .join(broadcast(wDf), "bucket")
      .groupBy("doc_id").agg(sum(col("cnt") * col("wv")).as("margin"))
      .withColumn("prob", lit(1.0) / (lit(1.0) + exp(-col("margin"))))
  }

  /** Threshold filter over [[scoreDocs]]: keep docs with prob ≥ t —
    * the pipeline's model-based keep decision. */
  def filterByScore(docs: DataFrame, model: LogisticModel, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.join(
      scoreDocs(docs, model, idCol, textCol)
        .filter(col("prob") >= threshold)
        .select(col("doc_id").as(idCol)),
      Seq(idCol), "left_semi")
}
