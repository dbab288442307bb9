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

  private def quantC(c: org.apache.spark.sql.Column) =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Reliability diagram for a scored classifier (Guo et al. 2017's
    * calibration methodology): probabilities — 1e-6-canonized FIRST so
    * bin membership is a function both engines reproduce — fall into
    * `nBins` equal-width bins; each bin reports its size, mean
    * confidence, and empirical accuracy. |confidence − accuracy| per
    * bin is what a filter threshold actually means in practice — an
    * uncalibrated quality model silently shifts the keep rate. One
    * doc-keyed join + one bin-keyed aggregate; nothing corpus-wide. */
  def calibrationBins(scored: DataFrame, labels: DataFrame, nBins: Int = 10,
      idCol: String = "doc_id", probCol: String = "prob",
      labelCol: String = "y"): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    scored.select(col(idCol).as("doc_id"), quantC(col(probCol)).as("p"))
      .join(labels.select(col(idCol).as("doc_id"),
        col(labelCol).cast("double").as("y")), "doc_id")
      .withColumn("bin",
        least(floor(col("p") * lit(nBins)).cast("long"), lit(nBins - 1L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        quantC(avg("p")).as("confidence"),
        quantC(avg("y")).as("accuracy"))
  }

  /** Expected calibration error from a [[calibrationBins]] frame:
    * ECE = Σ_b (n_b / N) · |confidence_b − accuracy_b|, canonized. */
  def expectedCalibrationError(bins: DataFrame): DataFrame =
    bins.agg(
      quantC(sum(col("n") * abs(col("confidence") - col("accuracy")))
        / sum(col("n"))).as("ece"),
      sum(col("n")).as("n_total"))

  /** Cohen's kappa between two labelings of the same ids (annotator or
    * model-vs-truth agreement, corrected for chance): κ = (p_o − p_e) /
    * (1 − p_e) with p_o the observed agreement and p_e the product-of-
    * marginals chance agreement over the joint category set. Both rates
    * are 1e-6-canonized before the κ division so the arithmetic is
    * engine-reproducible; κ is null when p_e = 1 (both sides constant
    * and identical — agreement is vacuous, 0/0). One id-keyed join +
    * category-keyed aggregates; categories are model-sized. */
  /** ROC AUC by the Mann–Whitney rank identity — the ranking-quality
    * number the per-class P/R/F and calibration read-outs don't give:
    * AUC = P(score(random positive) > score(random negative)), ties at
    * half credit, which equals
    *
    *   AUC = (Σ_{positives} r̄ − P(P+1)/2) / (P·N)
    *
    * with r̄ the TIE-AVERAGED global rank. Distributed shape: ranks come
    * from [[Sampling.globalOrdinal]] (the TeraSort-style two-phase rank —
    * no corpus-sized single-partition window anywhere), and the tie
    * average is one score-keyed aggregate: within a score group the
    * ordinals are consecutive, so avg(ordinal) IS the average tie rank.
    * Exactness: average ranks are half-integers and their positive-side
    * sum is exact in doubles, so the single canonized division is
    * hash-stable against the oracle (which replays the rank arithmetic
    * with a plain window — oracle-side cost, not engine-side). Null
    * scores/labels are dropped; AUC is null when either class is empty.
    * Output: one row (n_pos, n_neg, auc). */
  def rocAuc(scored: DataFrame, labelCol: String, scoreCol: String,
      idCol: String): DataFrame = {
    val base = scored
      .filter(col(scoreCol).isNotNull && !isnan(col(scoreCol).cast("double")) &&
        col(labelCol).isNotNull)
      .select(col(idCol), col(scoreCol).cast("double").as("__auc_s"),
        col(labelCol).cast("boolean").as("__y"))
    val ranked = Sampling.globalOrdinal(base, "__auc_s", idCol)
    val tieAvg = ranked.groupBy(col("__auc_s")).agg(avg(col("ordinal")).as("rbar"))
    val agg = ranked.join(tieAvg, Seq("__auc_s"))
      .agg(sum(when(col("__y"), col("rbar"))).as("rsum"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("__y"), 0L).otherwise(1L)).as("n_neg"))
    agg.select(col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        quantC((col("rsum") - col("n_pos") * (col("n_pos") + lit(1L)) / lit(2.0))
          / (col("n_pos") * col("n_neg")))).as("auc"))
  }

  def agreementKappa(a: DataFrame, b: DataFrame,
      idCol: String = "doc_id", labelCol: String = "label"): DataFrame = {
    val pair = a.select(col(idCol).as("doc_id"), col(labelCol).as("la"))
      .join(b.select(col(idCol).as("doc_id"), col(labelCol).as("lb")), "doc_id")
      .filter(col("la").isNotNull && col("lb").isNotNull)
    val n = pair.agg(count(lit(1)).as("n"))
    val po = pair.agg(quantC(avg(when(col("la") === col("lb"), 1.0)
      .otherwise(0.0))).as("po"))
    val ma = pair.groupBy(col("la").as("cat")).agg(count(lit(1)).as("ca"))
    val mb = pair.groupBy(col("lb").as("cat")).agg(count(lit(1)).as("cb"))
    val pe = ma.join(mb, Seq("cat"), "full_outer")
      .crossJoin(broadcast(n.select(col("n").as("nn"))))
      .agg(quantC(sum(coalesce(col("ca"), lit(0L)) * coalesce(col("cb"), lit(0L))
        / (col("nn") * col("nn")))).as("pe"))
    po.crossJoin(broadcast(pe)).crossJoin(broadcast(n))
      .select(col("po"), col("pe"),
        when(col("pe") < 1.0,
          quantC((col("po") - col("pe")) / (lit(1.0) - col("pe")))).as("kappa"),
        col("n"))
  }

  /** Per-class precision / recall / F1 (+ support) between a predicted
    * and a true labeling of the same ids — the per-class read-out the
    * confusion matrix summarizes and κ chance-corrects, completing the
    * classifier-QA family. One id-keyed inner join (ids absent from
    * either side are unscoreable, same contract as [[agreementKappa]]),
    * then everything is class-keyed and class-count-sized: tp per class,
    * predicted-count and true-count marginals, and the joint class set
    * from both sides (a class someone predicted but never occurs — or
    * vice versa — still gets a row). precision is null when the class
    * was never predicted (0/0), recall null when it has no support, F1
    * null when p + r = 0 or either factor is null; all three are
    * 1e-6-canonized AFTER the division (the division inputs are exact
    * longs, so canonizing once at the end is engine-reproducible).
    * Output: (cls, support, n_pred, tp, precision, recall, f1), ordered
    * by cls. */
  def perClassMetrics(pred: DataFrame, truth: DataFrame,
      idCol: String = "doc_id", labelCol: String = "label"): DataFrame = {
    val pair = pred.select(col(idCol).as("doc_id"), col(labelCol).as("pl"))
      .join(truth.select(col(idCol).as("doc_id"), col(labelCol).as("tl")), "doc_id")
      .filter(col("pl").isNotNull && col("tl").isNotNull)
    val classes = pair.select(col("pl").as("cls"))
      .union(pair.select(col("tl"))).distinct()
    val tp = pair.filter(col("pl") === col("tl"))
      .groupBy(col("pl").as("cls")).agg(count(lit(1)).as("tp"))
    val predN = pair.groupBy(col("pl").as("cls")).agg(count(lit(1)).as("n_pred"))
    val truthN = pair.groupBy(col("tl").as("cls")).agg(count(lit(1)).as("support"))
    classes
      .join(truthN, Seq("cls"), "left")
      .join(predN, Seq("cls"), "left")
      .join(tp, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("precision",
        when(col("n_pred") > 0, quantC(col("tp") / col("n_pred"))))
      .withColumn("recall",
        when(col("support") > 0, quantC(col("tp") / col("support"))))
      .withColumn("f1",
        when(col("precision").isNotNull && col("recall").isNotNull &&
          col("precision") + col("recall") > 0,
          quantC(lit(2.0) * col("precision") * col("recall")
            / (col("precision") + col("recall")))))
      .orderBy("cls")
  }
}
