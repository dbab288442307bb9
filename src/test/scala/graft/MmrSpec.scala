package graft

import org.apache.spark.sql.functions._
import graft.ext.{Mmr, Similarity}

class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, Seq[Double])*) =
    rows.toDF("vec_id", "embedding")

  private val query = Seq((100L, Seq(1.0, 0.0, 0.0))).toDF("query_id", "query_emb")

  test("MMR diversifies where pure top-k picks near-duplicates") {
    // pick 1 must NOT be parallel to the query: if it is, rel(d) equals
    // sim(d, pick1) for every d and all marginal scores collapse to 0
    val emb = df(
      1L -> Seq(0.9, 0.4, 0.0),      // rel ~0.914 (top pick)
      2L -> Seq(0.88, 0.42, 0.0),    // near-dup of 1, rel ~0.902, sim≈0.9996
      3L -> Seq(0.6, -0.6, 0.0),     // diverse, rel ~0.707, sim to 1 ≈0.359
      4L -> Seq(-1.0, 0.0, 0.0))     // anti-relevant
    val pure = Similarity.bruteForceTopK(emb, query, k = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(pure == Seq(1L, 2L), s"pure top-2 must take the near-dups: $pure")
    val mmr = Mmr.mmrTopK(emb, query, k = 2, m = 4, lambda = 0.5)
      .select("rank", "vec_id").as[(Int, Long)].collect().toSeq
    assert(mmr == Seq(1 -> 1L, 2 -> 3L),
      s"MMR must swap the near-dup for the diverse candidate: $mmr")
  }

  test("lambda = 1 reduces to pure relevance ranking") {
    val emb = df(
      1L -> Seq(1.0, 0.0, 0.0),
      2L -> Seq(0.999, 0.02, 0.0),
      3L -> Seq(0.7, 0.7, 0.0),
      4L -> Seq(0.5, 0.8, 0.0))
    val mmr = Mmr.mmrTopK(emb, query, k = 3, m = 4, lambda = 1.0)
      .select("vec_id").as[Long].collect().toSeq
    val pure = Similarity.bruteForceTopK(emb, query, k = 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(mmr == pure, s"λ=1: $mmr vs $pure")
  }

  test("ties break on vec_id at every pick; deterministic across runs") {
    val emb = df(
      7L -> Seq(0.9, 0.1, 0.0),
      5L -> Seq(0.9, 0.1, 0.0),      // identical to 7 — lower id first
      3L -> Seq(0.0, 1.0, 0.0))
    val a = Mmr.mmrTopK(emb, query, k = 3, m = 3, lambda = 0.5)
      .select("rank", "vec_id").as[(Int, Long)].collect().toSeq
    assert(a.map(_._2).take(1) == Seq(5L), s"tie must pick lower id: $a")
    val b = Mmr.mmrTopK(emb, query, k = 3, m = 3, lambda = 0.5)
      .select("rank", "vec_id").as[(Int, Long)].collect().toSeq
    assert(a == b)
  }

  test("k above candidate count returns all; m caps the pool") {
    val emb = df(
      1L -> Seq(1.0, 0.0, 0.0),
      2L -> Seq(0.9, 0.1, 0.0),
      3L -> Seq(0.0, 1.0, 0.0))
    assert(Mmr.mmrTopK(emb, query, k = 10, m = 10).count() == 3)
    // m=2 pool is {1, 2} by relevance — the diverse 3 can never be picked
    val capped = Mmr.mmrTopK(emb, query, k = 2, m = 2, lambda = 0.3)
      .select("vec_id").as[Long].collect().toSet
    assert(capped == Set(1L, 2L), s"pool cap must exclude 3: $capped")
  }

  test("first pick is argmax relevance even when lambda is small") {
    val emb = df(
      1L -> Seq(1.0, 0.0, 0.0),
      2L -> Seq(0.0, 1.0, 0.0),
      3L -> Seq(0.0, 0.0, 1.0))
    val first = Mmr.mmrTopK(emb, query, k = 1, m = 3, lambda = 0.01)
      .select("vec_id").as[Long].head()
    assert(first == 1L)
  }

  test("parameter validation") {
    val emb = df(1L -> Seq(1.0, 0.0, 0.0))
    intercept[IllegalArgumentException](new ext.MmrAgg(k = 3, m = 2, lambda = 0.5))
    intercept[IllegalArgumentException](new ext.MmrAgg(k = 1, m = 1, lambda = 0.0))
    intercept[IllegalArgumentException](new ext.MmrAgg(k = 1, m = 1, lambda = 1.5))
    intercept[IllegalArgumentException](
      Mmr.mmrTopK(emb.withColumn("vec_id", lit("x")), query, k = 1, m = 1))
  }
}
