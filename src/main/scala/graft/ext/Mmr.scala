package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** One MMR candidate: id, relevance to the query, and its embedding —
  * carried through the aggregation so the greedy stage can compute
  * candidate–candidate similarity without a second corpus join.
  * Top-level so Catalyst's generated serializers can reach it. */
case class MmrCand(vec_id: Long, rel: Double, emb: Array[Double])

/** One MMR selection: rank in pick order, the quantized relevance, and
  * the λ-blended marginal score that won the pick. */
case class MmrPick(rank: Int, vec_id: Long, rel: Double, mmr: Double)

/** Bounded-state aggregator for Maximal Marginal Relevance re-ranking
  * (Carbonell & Goldstein, SIGIR 1998): the reduce/merge phases keep the
  * top `m` candidates by (rel desc, vec_id asc) — the same k-capped
  * partial-state discipline as [[TopKAgg]], so map-side combine bounds
  * every shuffle row at m·(dim+2) doubles per query regardless of corpus
  * size — and `finish` runs the greedy MMR selection of `k` picks over
  * the ≤ m survivors locally (m² cosine evaluations, model-sized by
  * contract).
  *
  * Greedy step: pick argmax over unselected d of
  * λ·rel(d) − (1−λ)·max over selected s of cos(d, s); the first pick has
  * no selected set and scores λ·rel alone (the paper's empty-max = 0
  * convention, restricted to the only round where it can apply — later
  * rounds use the TRUE max, which may be negative). Ties break on
  * vec_id ascending, scan-order-independently.
  *
  * Engine parity: relevances and pairwise similarities are QUANTIZED to
  * 1e-6 (floor(x·1e6 + 0.5)/1e6) before any scoring — cosines computed
  * by different engines differ in ulps, and the greedy argmax is a
  * tie-sensitive decision process, so the oracle replays the identical
  * decisions only if both engines feed it identical inputs (the same
  * lesson as the unigram-EM lattice). After quantization every score is
  * the same IEEE arithmetic on the same doubles in both engines. */
class MmrAgg(k: Int, m: Int, lambda: Double)
    extends Aggregator[MmrCand, Array[MmrCand], Array[MmrPick]] {
  require(k >= 1 && m >= k, s"need m >= k >= 1, got k=$k m=$m")
  require(lambda > 0.0 && lambda <= 1.0, s"lambda must be in (0,1], got $lambda")

  private def better(a: MmrCand, b: MmrCand): Boolean =
    a.rel > b.rel || (a.rel == b.rel && a.vec_id < b.vec_id)

  def zero: Array[MmrCand] = Array.empty

  def reduce(buf: Array[MmrCand], x: MmrCand): Array[MmrCand] = {
    if (buf.length == m && !better(x, buf(m - 1))) return buf
    val out = new Array[MmrCand](math.min(buf.length + 1, m))
    var i = 0
    var j = 0
    var placed = false
    while (j < out.length) {
      if (!placed && (i >= buf.length || better(x, buf(i)))) { out(j) = x; placed = true }
      else { out(j) = buf(i); i += 1 }
      j += 1
    }
    out
  }

  def merge(a: Array[MmrCand], b: Array[MmrCand]): Array[MmrCand] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[MmrCand](math.min(a.length + b.length, m))
    var i = 0
    var j = 0
    var o = 0
    while (o < out.length) {
      out(o) =
        if (j >= b.length || (i < a.length && better(a(i), b(j)))) { val v = a(i); i += 1; v }
        else { val v = b(j); j += 1; v }
      o += 1
    }
    out
  }

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Bit-identical mirror of graft.expr.CosineSimilarity.nullSafeEval:
    * one fused pass, dot / (sqrt(na) · sqrt(nb)). */
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i); val y = b(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def finish(buf: Array[MmrCand]): Array[MmrPick] = {
    if (buf.isEmpty) return Array.empty
    val mu = 1.0 - lambda
    val n = buf.length
    val picked = new Array[Boolean](n)
    // max quantized similarity to the selected set; NegativeInfinity
    // marks "no selected yet" (only possible in round 1)
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val out = new Array[MmrPick](math.min(k, n))
    var r = 0
    while (r < out.length) {
      var best = -1
      var bestScore = 0.0
      var i = 0
      while (i < n) {
        if (!picked(i)) {
          val score =
            if (r == 0) lambda * q6(buf(i).rel)
            else lambda * q6(buf(i).rel) - mu * maxSim(i)
          if (best < 0 || score > bestScore ||
              (score == bestScore && buf(i).vec_id < buf(best).vec_id)) {
            best = i
            bestScore = score
          }
        }
        i += 1
      }
      picked(best) = true
      out(r) = MmrPick(r + 1, buf(best).vec_id, q6(buf(best).rel), bestScore)
      var j = 0
      while (j < n) {
        if (!picked(j)) {
          val s = q6(cos(buf(j).emb, buf(best).emb))
          if (s > maxSim(j)) maxSim(j) = s
        }
        j += 1
      }
      r += 1
    }
    out
  }

  def bufferEncoder: Encoder[Array[MmrCand]] = ExpressionEncoder[Array[MmrCand]]()
  def outputEncoder: Encoder[Array[MmrPick]] = ExpressionEncoder[Array[MmrPick]]()
}

/** Maximal Marginal Relevance diversity re-ranking over embedding
  * retrieval — the standard fix for near-duplicate-saturated top-k
  * results (RAG context assembly, diverse eval-set selection): blend
  * relevance to the query with redundancy against what is already
  * picked.
  *
  * Plan shape: one corpus scan scores every vector against the
  * broadcast queries (the [[Similarity.bruteForceTopK]] shape), then
  * ONE aggregation does both stages — the [[MmrAgg]] partial states are
  * the top-m-by-relevance candidate pool (so the shuffle moves
  * m·(dim+2) doubles per query per partition, never the corpus), and
  * its finish runs the greedy selection. No global window, no second
  * join, no driver collect. */
object Mmr {

  /** Greedy MMR top-k per query: `m` is the relevance-ranked candidate
    * pool size the greedy stage diversifies over (the paper's R). Ties
    * at every decision break on vec_id. Output: (query_id, rank,
    * vec_id, rel, mmr) in pick order; rel and mmr are 1e-6-quantized by
    * the parity contract documented on [[MmrAgg]]. */
  def mmrTopK(
      embeddings: DataFrame,
      queries: DataFrame,
      k: Int,
      m: Int,
      lambda: Double = 0.7,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      queryIdCol: String = "query_id",
      queryEmbCol: String = "query_emb"): DataFrame = {
    import org.apache.spark.sql.types.NumericType
    val f = embeddings.schema.find(_.name == idCol).getOrElse(
      throw new IllegalArgumentException(s"id column '$idCol' not found"))
    require(f.dataType.isInstanceOf[NumericType],
      s"id column '$idCol' must be numeric (found ${f.dataType.simpleString})")
    val agg = udaf(new MmrAgg(k, m, lambda))
    embeddings
      .select(col(idCol).cast("long").as("vec_id"),
        col(embCol).cast("array<double>").as("emb"))
      .crossJoin(broadcast(queries.select(
        col(queryIdCol).as("query_id"),
        col(queryEmbCol).cast("array<double>").as("qemb"))))
      .withColumn("rel", Dedup.cosine(col("emb"), col("qemb")))
      .filter(col("vec_id").isNotNull && col("rel").isNotNull && !isnan(col("rel")))
      .groupBy("query_id")
      .agg(agg(col("vec_id"), col("rel"), col("emb")).as("picks"))
      .select(col("query_id"), explode(col("picks")).as("p"))
      .select(col("query_id"), col("p.rank").as("rank"),
        col("p.vec_id").as("vec_id"), col("p.rel").as("rel"),
        col("p.mmr").as("mmr"))
      .orderBy("query_id", "rank")
  }
}
