package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse random projection (Achlioptas 2003, "Database-friendly random
  * projections"): the train-free Johnson–Lindenstrauss dimensionality-
  * reduction tier next to the trained [[Pca]] path. Entries of the k×dim
  * projection matrix are drawn from {+1, −1, 0} with probabilities
  * {1/6, 1/6, 2/3} and the output is scaled by √(3/k), which preserves
  * pairwise Euclidean distances in expectation with variance O(1/k) —
  * and two thirds of the multiply-adds vanish.
  *
  * The matrix is DETERMINISTIC, not sampled: cell (i, j) is derived from
  * the replayable mixed hash ([[Sketches.mixHash]] arithmetic — Knuth
  * multiplicative step + murmur3 fmix32 finalizer) of the cell key
  * i·k + j, taken mod 6 (0 → +1, 1 → −1, else 0). Same matrix on every
  * run, every engine, no rand(): the oracle regenerates it cell-by-cell
  * in SQL (q_randproj_embeddings), and a refit after failure cannot
  * reshuffle a corpus's projected space.
  *
  * Scale shape: the matrix is model-sized (k·dim literals baked into the
  * projection expressions), the corpus is mapped row-locally — zero
  * shuffles, zero driver state, trivially right at 100 TB. Each output
  * component is one fused native [[graft.expr.DotProduct.dotProduct]]
  * pass (ascending-index accumulation — the oracle mirrors the fold
  * order with list_reduce, so the doubles match bit-for-bit). */
object RandomProjection {

  /** Shared driver-local mirror of the [[Sketches.mixHash]] column
    * arithmetic (asserted equal in SketchesSpec). */
  private def mixHashLocal(id: Long): Long = Sketches.mixHashLocal(id)

  /** The deterministic Achlioptas sign matrix, k rows × dim cols:
    * R(j)(i) = {0→+1, 1→−1, 2..5→0}(mixHash(i·k + j) mod 6). Public so
    * tests and exporters can see exactly what the engine projects with. */
  def signMatrix(dim: Int, k: Int): Array[Array[Double]] = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    require(k >= 1, s"k must be >= 1, got $k")
    Array.tabulate(k, dim) { (j, i) =>
      mixHashLocal(i.toLong * k + j) % 6 match {
        case 0 => 1.0
        case 1 => -1.0
        case _ => 0.0
      }
    }
  }

  /** Project `embCol` (array<double> of length `dim`) to k dimensions:
    * proj_j = √(3/k) · Σ_i v_i · R(j)(i). Vectors of the wrong length
    * project to null (the native dot product nulls on length mismatch —
    * mirrored by an explicit guard so the whole array is null, not k
    * nulls). Output: (vec_id, proj array<double> of length k). */
  def project(
      embeddings: DataFrame,
      dim: Int,
      k: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val r = signMatrix(dim, k)
    val scale = math.sqrt(3.0 / k)
    val comps = (0 until k).map { j =>
      lit(scale) * graft.expr.DotProduct.dotProduct(
        col("emb"), array(r(j).map(lit): _*))
    }
    embeddings
      .select(col(idCol).cast("long").as("vec_id"),
        col(embCol).cast("array<double>").as("emb"))
      .select(col("vec_id"),
        when(size(col("emb")) === dim, array(comps: _*))
          .otherwise(lit(null).cast("array<double>")).as("proj"))
  }
}
