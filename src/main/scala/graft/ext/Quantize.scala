package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 embedding quantization (the standard
  * scalar-quantization storage format for large ANN corpora — public
  * FAISS "SQ8" scheme): code_i = round(v_i / s) with s = max|v| / 127,
  * stored as `codes array<tinyint>` + one double `scale` per vector.
  * 4× smaller than float32 at rest — at 100 TB of embeddings that is the
  * difference between 25 TB and 100 TB of scan per brute-force pass.
  *
  * Cosine is SCALE-INVARIANT per vector, so ranking quantized vectors by
  * cosine needs no dequantization at all: cos(s·c, q) = cos(c, q). The
  * search path therefore runs straight on the codes; `dequantize` exists
  * for consumers that need approximate values back.
  *
  * All expressions, no UDFs; rounding is floor(x + 0.5) — round-half-up,
  * identical in Spark and ANSI SQL engines, so the whole transform is
  * replayable cross-engine (q_quantize_embeddings).
  */
object Quantize {

  /** (vec_id, scale, codes) — codes in [-127, 127] as tinyint. Zero-norm
    * vectors get scale 0.0 and all-zero codes (CASE-mirrored in the
    * oracle). */
  def quantizeEmbeddings(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    embeddings
      .select(col(idCol).cast("long").as("vec_id"),
        col(embCol).cast("array<double>").as("emb"))
      .withColumn("scale",
        aggregate(transform(col("emb"), v => abs(v)), lit(0.0d),
          (acc, v) => greatest(acc, v)) / lit(127.0))
      .withColumn("codes",
        when(col("scale") > 0,
          transform(col("emb"),
            v => floor(v / col("scale") + lit(0.5)).cast("tinyint")))
          .otherwise(transform(col("emb"), _ => lit(0).cast("tinyint"))))
      .select("vec_id", "scale", "codes")
  }

  /** Approximate float reconstruction: v̂_i = codes_i · scale. Max
    * per-component error is scale/2 by construction. */
  def dequantize(quantized: DataFrame): DataFrame =
    quantized.withColumn("embedding",
      transform(col("codes"), c => c.cast("double") * col("scale")))

  /** Exact top-k by cosine over QUANTIZED vectors — identical ranking to
    * brute force over the dequantized values (per-vector scale cancels in
    * cosine), at a quarter of the scan bytes. Queries stay full-precision. */
  def quantizedTopK(
      quantized: DataFrame,
      queries: DataFrame,
      k: Int,
      queryIdCol: String = "query_id",
      queryEmbCol: String = "query_emb"): DataFrame =
    Similarity.bruteForceTopK(
      quantized.select(col("vec_id"),
        transform(col("codes"), c => c.cast("double")).as("embedding")),
      queries, k,
      queryIdCol = queryIdCol, queryEmbCol = queryEmbCol)
}
