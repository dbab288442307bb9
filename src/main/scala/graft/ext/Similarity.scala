package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor similarity search over an embedding column
  * (SURVEY §7.4): brute-force cosine top-k as the exact baseline, and a
  * sign-LSH bucketed variant as the scale path (probe the query's bucket
  * plus all 1-bit-flip neighbors — multiprobe — so recall degrades
  * gracefully instead of falling off a bucket boundary).
  *
  * Scale notes: brute force is O(N·Q) with the query side broadcast — right
  * whenever Q is small; the LSH path turns the scan into a bucket-equijoin
  * (one shuffle on bucket id) whose probe fan-out is bits+1 buckets per
  * query, independent of N.
  */
object Similarity {

  /** Exact top-k by cosine for each query vector. `queries` must be small
    * (it is broadcast). Deterministic ties: (cos desc, vec_id asc).
    *
    * Ranking is a k-capped aggregation (TopKAgg), NOT a global per-query
    * window: map-side combine reduces every scan partition to ≤ k rows per
    * query, so the shuffle moves k·P rows instead of all N scored rows —
    * the plan that survives 1B vectors. */
  def bruteForceTopK(
      embeddings: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      queryIdCol: String = "query_id",
      queryEmbCol: String = "query_emb"): DataFrame = {
    val topk = udaf(new TopKAgg(k))
    embeddings
      .select(col(idCol).cast("long").as("vec_id"), col(embCol).cast("array<double>").as("emb"))
      .crossJoin(broadcast(queries.select(
        col(queryIdCol).as("query_id"), col(queryEmbCol).cast("array<double>").as("qemb"))))
      .withColumn("cos", Dedup.cosine(col("emb"), col("qemb")))
      .groupBy("query_id")
      .agg(topk(col("vec_id"), col("cos")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "sv")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("sv.vec_id").as("vec_id"), col("sv.cos").as("cos"))
      .orderBy("query_id", "rank")
  }

  /** Approximate top-k: sign-LSH buckets with 1-bit multiprobe. Recall is
    * validated against the brute-force baseline in SimilaritySpec. */
  def lshTopK(
      embeddings: DataFrame,
      queries: DataFrame,
      k: Int,
      dim: Int = 64,
      bits: Int = 10,
      seed: Long = 42L,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      queryIdCol: String = "query_id",
      queryEmbCol: String = "query_emb"): DataFrame = {
    val planes = Dedup.hyperplanes(dim, bits, seed)
    val data = embeddings.select(
      col(idCol).as("vec_id"),
      col(embCol).cast("array<double>").as("emb"),
      Dedup.lshBucket(col(embCol).cast("array<double>"), planes).as("bucket"))
    val qBase = queries.select(
      col(queryIdCol).as("query_id"),
      col(queryEmbCol).cast("array<double>").as("qemb"),
      Dedup.lshBucket(col(queryEmbCol).cast("array<double>"), planes).as("qbucket"))
    // multiprobe: exact bucket + every 1-bit flip
    val probes = (0 until bits).map(i => col("qbucket").bitwiseXOR(lit(1L << i))) :+ col("qbucket")
    val probed = qBase.select(col("query_id"), col("qemb"),
      explode(array(probes: _*)).as("bucket"))
    // No distinct needed: the bits+1 probe buckets of a query are pairwise
    // distinct values and each data vector lives in exactly one bucket, so
    // the equijoin cannot produce a (query, vec) pair twice — a distinct
    // here would only add a full extra exchange of the candidate set.
    // Ranking via the k-capped aggregator (see bruteForceTopK) keeps the
    // per-query state bounded regardless of candidate count.
    val topk = udaf(new TopKAgg(k))
    probed.join(data, "bucket")
      .withColumn("cos", Dedup.cosine(col("emb"), col("qemb")))
      .groupBy("query_id")
      .agg(topk(col("vec_id").cast("long"), col("cos")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "sv")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("sv.vec_id").as("vec_id"), col("sv.cos").as("cos"))
      .orderBy("query_id", "rank")
  }
}
