package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Upper-triangle accumulator for the centered Gram/covariance matrix:
  * reduce adds (x−μ)(x−μ)ᵀ entries for one vector, merge adds buffers —
  * the state is dim·(dim+1)/2 doubles (a MODEL: 2,080 for dim 64), so
  * map-side combine reduces every partition to one buffer and the
  * shuffle carries P buffers, never vectors. Vectors of the wrong length
  * or with null slots are skipped and counted nowhere — callers
  * pre-filter, matching the Similarity contract. Top-level for Catalyst's
  * serializer, like [[ScoredVec]]. */
class GramAgg(mean: Array[Double]) extends Aggregator[Seq[Double], Array[Double], Array[Double]] {
  private val d = mean.length
  def zero: Array[Double] = new Array[Double](d * (d + 1) / 2)
  def reduce(buf: Array[Double], x: Seq[Double]): Array[Double] = {
    if (x == null || x.length != d) return buf
    val c = new Array[Double](d)
    var i = 0
    while (i < d) { c(i) = x(i) - mean(i); i += 1 }
    var t = 0
    i = 0
    while (i < d) {
      var j = i
      while (j < d) { buf(t) += c(i) * c(j); j += 1; t += 1 }
      i += 1
    }
    buf
  }
  def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var t = 0
    while (t < a.length) { a(t) += b(t); t += 1 }
    a
  }
  def finish(buf: Array[Double]): Array[Double] = buf
  def bufferEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  def outputEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

/** PCA whitening for embedding corpora — the standard preprocessing the
  * public SemDeDup/OPQ literature applies before clustering or product
  * quantization (decorrelate + equalize variance so L2/cosine geometry
  * is isotropic). Spark-shaped in two corpus passes, both with
  * model-sized shuffles:
  *
  *   1. mean: posexplode + per-position average (dim-row aggregate);
  *   2. centered covariance: [[GramAgg]] — per-partition upper-triangle
  *      accumulation, P model-sized buffers merged on the driver's
  *      single-row result.
  *
  * The dim×dim eigendecomposition runs on the DRIVER (Breeze `eigSym` —
  * the matrix is a model; this is the [[Similarity.trainIvfCentroids]]
  * collect-a-model pattern, not a data collect). Projection/whitening is
  * a pure expression fold per row with the centered vector let-bound
  * through a single-element transform (the langId trick) so the O(dim)
  * centering runs once per row, not once per output component.
  *
  * Oracle strategy (q_pca_cov_embeddings): the covariance pass — the
  * distributed 99% of the operator — is hash-oracled entry-by-entry
  * against DuckDB (Σ(xi−μi)(xj−μj)/n with the same centered algebra).
  * The eigen step is iterative driver numerics (like GARCH MLE, a
  * declared non-oracle class) and is property-tested instead: components
  * orthonormal, whitened covariance = identity, reconstruction error
  * bounded — PcaSpec. */
object Pca {

  final case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]], // k rows × dim, orthonormal, eigenvalue-descending
      eigenvalues: Array[Double])

  /** Per-position mean of the embedding column (dim-row aggregate,
    * collected as a model). Vectors shorter than `dim` are excluded from
    * EVERY position (length filter, not ragged averaging) so the mean,
    * covariance, and projection all see the same row set. */
  private[graft] def meanVector(
      embeddings: DataFrame, dim: Int, embCol: String): Array[Double] = {
    val rows = embeddings
      .select(col(embCol).cast("array<double>").as("emb"))
      .filter(size(col("emb")) === dim)
      .select(posexplode(col("emb")).as(Seq("pos", "v")))
      .groupBy("pos").agg(avg("v").as("m"))
      .collect()
    require(rows.length == dim, s"no length-$dim vectors to fit on")
    val m = new Array[Double](dim)
    rows.foreach(r => m(r.getAs[Int]("pos")) = r.getAs[Double]("m"))
    m
  }

  /** Centered population covariance as upper-triangle rows (i ≤ j):
    * (i, j, cov) with cov = Σ(xi−μi)(xj−μj)/n — the oracle-able surface
    * of the fit. */
  def covarianceMatrix(
      embeddings: DataFrame,
      dim: Int,
      embCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val mean = meanVector(embeddings, dim, embCol)
    val filtered = embeddings
      .select(col(embCol).cast("array<double>").as("emb"))
      .filter(size(col("emb")) === dim)
    val n = filtered.count()
    require(n > 0, "empty corpus")
    val gram = udaf(new GramAgg(mean))
    val flat = filtered.agg(gram(col("emb")).as("g")).head().getSeq[Double](0)
    val rows = for { i <- 0 until dim; j <- i until dim } yield
      (i, j, flat(i * dim - i * (i - 1) / 2 + (j - i)) / n)
    rows.toDF("i", "j", "cov")
  }

  /** Fit a k-component whitening model: mean + covariance passes, then
    * driver-side symmetric eigendecomposition; components are the top-k
    * eigenvectors (eigenvalue-descending, sign-canonicalized so the
    * largest-|coordinate| entry is positive — eigenvectors are
    * sign-ambiguous and determinism is part of the library contract). */
  def fitPcaWhitening(
      embeddings: DataFrame,
      dim: Int,
      k: Int,
      embCol: String = "embedding"): PcaModel = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim], got $k")
    val mean = meanVector(embeddings, dim, embCol)
    val filtered = embeddings
      .select(col(embCol).cast("array<double>").as("emb"))
      .filter(size(col("emb")) === dim)
    val n = filtered.count()
    require(n > 1, s"need more than one vector to fit, got $n")
    val gram = udaf(new GramAgg(mean))
    val flat = filtered.agg(gram(col("emb")).as("g")).head().getSeq[Double](0)
    val m = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
    var t = 0
    for (i <- 0 until dim; j <- i until dim) {
      m(i, j) = flat(t) / n; m(j, i) = m(i, j); t += 1
    }
    val es = breeze.linalg.eigSym(m)
    // breeze returns eigenvalues ascending; take the top k, largest first
    val order = (0 until dim).sortBy(i => -es.eigenvalues(i)).take(k)
    val comps = order.map { c =>
      val v = Array.tabulate(dim)(r => es.eigenvectors(r, c))
      val amax = v.indices.maxBy(i => math.abs(v(i)))
      if (v(amax) < 0) v.map(-_) else v
    }.toArray
    PcaModel(mean, comps, order.map(es.eigenvalues(_)).toArray)
  }

  /** Apply the model: y_r = Wᵣ·(x − μ) / sqrt(λᵣ + eps) (whitening; pass
    * eps to regularize near-zero eigenvalues, or `whiten = false` for a
    * plain projection). Pure expressions: the centered vector is
    * let-bound via a one-element transform so centering is evaluated
    * once per row regardless of k. Vectors of the wrong length yield
    * null output (kept, flagged by `pca_ok`). */
  def transformPca(
      embeddings: DataFrame,
      model: PcaModel,
      embCol: String = "embedding",
      outCol: String = "pca",
      whiten: Boolean = true,
      eps: Double = 1e-9): DataFrame = {
    val dim = model.mean.length
    val meanLit = array(model.mean.map(lit): _*)
    val centered = zip_with(col(embCol).cast("array<double>"), meanLit, (x, mu) => x - mu)
    val projected = transform(array(centered), ce =>
      array(model.components.zipWithIndex.map { case (row, r) =>
        val dot = aggregate(zip_with(ce, array(row.map(lit): _*), (c, w) => c * w),
          lit(0.0d), (a, v) => a + v)
        if (whiten) dot / lit(math.sqrt(model.eigenvalues(r) + eps)) else dot
      }: _*))
    embeddings
      .withColumn("pca_ok", size(col(embCol).cast("array<double>")) === dim)
      .withColumn(outCol, when(col("pca_ok"), element_at(projected, 1)))
  }
}
