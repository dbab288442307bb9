package graft

import org.apache.spark.sql.functions._
import graft.ext.{Quantize, Similarity}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 round-trip error bounded by scale/2; zero vectors safe") {
    val df = Seq(
      (1L, Seq(0.5, -1.0, 0.25, 0.125)),
      (2L, Seq(3.0, 2.0, -3.0, 0.0)),
      (3L, Seq(0.0, 0.0, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    val q = Quantize.quantizeEmbeddings(df)
    val rows = Quantize.dequantize(q)
      .join(df.withColumnRenamed("embedding", "orig"), "vec_id")
      .select("vec_id", "scale", "embedding", "orig").collect()
    rows.foreach { r =>
      val s = r.getDouble(1)
      val deq = r.getSeq[Double](2); val orig = r.getSeq[Double](3)
      deq.zip(orig).foreach { case (d, o) =>
        assert(math.abs(d - o) <= s / 2 + 1e-12,
          s"vec ${r.getLong(0)}: err ${math.abs(d - o)} > ${s / 2}")
      }
    }
    // codes live in [-127, 127]; extremes hit exactly
    val c2 = q.filter($"vec_id" === 2L).head().getSeq[Byte](2)
    assert(c2.contains(127.toByte) && c2.contains(-127.toByte), s"$c2")
    // zero vector: scale 0, all-zero codes, and dequantize returns zeros
    val z = q.filter($"vec_id" === 3L).head()
    assert(z.getDouble(1) == 0.0)
    assert(z.getSeq[Byte](2).forall(_ == 0))
  }

  test("null embeddings: null codes in storage, dropped from search") {
    val df = Seq(
      (1L, Some(Seq(1.0, 0.0))),
      (2L, None: Option[Seq[Double]])
    ).toDF("vec_id", "embedding")
    val q = Quantize.quantizeEmbeddings(df)
    val nullRow = q.filter($"vec_id" === 2L).head()
    assert(nullRow.isNullAt(1) && nullRow.isNullAt(2), "null emb must stay null")
    val queries = Seq((1L, Seq(1.0, 0.0))).toDF("query_id", "query_emb")
    val top = Quantize.quantizedTopK(q, queries, k = 5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(top == Set(1L), s"null-emb vector leaked into search: $top")
  }

  test("property: code range, reconstruction bound, cosine preservation") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // local mirror of the quantize expressions (scale = max|v|/127,
    // round-half-up codes) — property-checked on 200 seeded draws, then
    // the mirror itself is pinned against the Spark output below
    def quantLocal(v: Array[Double]): (Double, Array[Int]) = {
      val s = v.map(math.abs).max / 127.0
      (s, if (s > 0) v.map(x => math.floor(x / s + 0.5).toInt) else v.map(_ => 0))
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val vec = Gen.choose(2, 48).flatMap(d =>
      Gen.listOfN(d, Gen.choose(-100.0, 100.0)).map(_.toArray))
    (0 until 200).foreach { i =>
      vec(Gen.Parameters.default, Seed(7L + i)).foreach { v =>
        if (v.exists(_ != 0.0)) {
          val (s, c) = quantLocal(v)
          assert(c.forall(x => x >= -127 && x <= 127), s"range: ${c.mkString(",")}")
          v.zip(c).foreach { case (x, code) =>
            assert(math.abs(code * s - x) <= s / 2 + 1e-12, s"bound: $x vs ${code * s}")
          }
          val cd = math.abs(cos(v, v.map(x => x)) - cos(c.map(_.toDouble), v))
          assert(cd <= 0.05, s"cosine drift $cd for dim ${v.length}")
        }
      }
    }
    // the local mirror matches the Spark expressions exactly
    val sample = Seq(
      (1L, Seq(3.7, -12.25, 0.004, 99.9)),
      (2L, Seq(-0.5, 0.5)),
      (3L, Seq(64.0, -127.0, 127.0)))
    val fromSpark = Quantize.quantizeEmbeddings(sample.toDF("vec_id", "embedding"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getSeq[Byte](2).map(_.toInt).toArray))).toMap
    sample.foreach { case (id, v) =>
      val (s, c) = quantLocal(v.toArray)
      val (ss, sc) = fromSpark(id)
      assert(ss == s && sc.sameElements(c), s"mirror drift for vec $id")
    }
  }

  test("quantized top-k ranks like brute force on clustered data") {
    val rng = new scala.util.Random(11)
    val centers = Array.fill(4)(Array.fill(16)(rng.nextGaussian()))
    val df = (0L until 200L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(_ + rng.nextGaussian() * 0.05).toSeq)
    }.toDF("vec_id", "embedding")
    val q = df.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"),
        $"embedding".cast("array<double>").as("query_emb"))
    val brute = Similarity.bruteForceTopK(df, q, k = 10)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Quantize.quantizedTopK(Quantize.quantizeEmbeddings(df), q, k = 10)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = quant.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall vs brute")
  }

  test("binary signatures: hand-checked packing, NaN guard, multi-word") {
    val df = Seq(
      (1L, Seq(0.5, -1.0, 2.0)),            // bits 0, 2 → 5
      (2L, Seq(Double.NaN, 1.0)),           // NaN sets NO bit → 2
      (3L, Seq(0.0, -0.0, 1e-300)),         // strict > 0: only bit 2 → 4
      (4L, (0 until 40).map(_ => 1.0))      // 40 dims → words [2^32-1, 2^8-1]
    ).toDF("vec_id", "embedding")
    val sig = Quantize.binarySignatures(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    assert(sig(1L) == ((3L, Seq(5L))), s"${sig(1L)}")
    assert(sig(2L) == ((2L, Seq(2L))), s"${sig(2L)}")
    assert(sig(3L) == ((3L, Seq(4L))), s"${sig(3L)}")
    assert(sig(4L) == ((40L, Seq(4294967295L, 255L))), s"${sig(4L)}")
  }

  test("hamming distance: popcount of word-wise xor") {
    val df = Seq((1L, Seq(5L, 255L), Seq(6L, 0L))).toDF("id", "a", "b")
    // 5^6 = 3 (2 bits), 255^0 = 255 (8 bits) → 10
    val d = df.select(Quantize.hammingDistance($"a", $"b").as("d")).head().getLong(0)
    assert(d == 10L, s"$d")
  }

  test("binary top-k: null embeddings never reach the candidate cut") {
    val df = Seq(
      (1L, Some(Seq(1.0, 0.0))),
      (2L, Some(Seq(0.9, 0.1))),
      (3L, None: Option[Seq[Double]])
    ).toDF("vec_id", "embedding")
    val q = Seq((1L, Seq(1.0, 0.0))).toDF("query_id", "query_emb")
    val got = Quantize.binaryTopK(df, q, k = 5, rerank = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L), s"null-emb vector leaked: $got")
  }

  test("binary top-k: full-coverage rerank equals brute force exactly") {
    val rng = new scala.util.Random(23)
    val centers = Array.fill(4)(Array.fill(16)(rng.nextGaussian()))
    val df = (0L until 200L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(_ + rng.nextGaussian() * 0.05).toSeq)
    }.toDF("vec_id", "embedding")
    val q = df.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"),
        $"embedding".cast("array<double>").as("query_emb"))
    def rows(r: org.apache.spark.sql.DataFrame) = r
      .select("query_id", "rank", "vec_id").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getLong(2))).toSet
    // rerank·k = 200 covers the whole corpus → stage 2 IS brute force
    val bin = rows(Quantize.binaryTopK(df, q, k = 10, rerank = 20))
    val brute = rows(Similarity.bruteForceTopK(df, q, k = 10))
    assert(bin == brute, "full-coverage binary ≠ brute")
    // production rerank: self at rank 1 (hamming(self,self)=0 always
    // survives stage 1) and high recall on clustered data
    val prod = Quantize.binaryTopK(df, q, k = 10, rerank = 4)
    val self = prod.filter($"rank" === 1)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    self.foreach { case (qid, vid) => assert(qid == vid, s"self not rank-1: $qid → $vid") }
    val recall = rows(prod).map { case (a, _, c) => (a, c) }
      .intersect(brute.map { case (a, _, c) => (a, c) }).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("matryoshka truncation: prefix-dim search ranks by prefix cosine, full dPrime = brute") {
    // vec 2 matches the query on the FIRST two dims; vec 3 only on the tail —
    // truncation to dPrime=2 must prefer 2, full-dim must prefer 3
    val df = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.9, 0.1, 0.0, 0.0)),
      (3L, Seq(0.9, 0.1, 5.0, 5.0))
    ).toDF("vec_id", "embedding")
    val q = Seq((0L, Seq(0.9, 0.1, 5.0, 5.0))).toDF("query_id", "query_emb")
    val trunc = Similarity.truncatedTopK(df, q, k = 1, dPrime = 2).collect()
    assert(trunc(0).getAs[Long]("vec_id") == 2L, s"got ${trunc.toSeq}")
    val full = Similarity.bruteForceTopK(df, q, k = 1).collect()
    assert(full(0).getAs[Long]("vec_id") == 3L)
    // dPrime >= dim degenerates to exact brute force, bit-for-bit
    val t4 = Similarity.truncatedTopK(df, q, k = 3, dPrime = 4).collect().toSeq
    val b4 = Similarity.bruteForceTopK(df, q, k = 3).collect().toSeq
    assert(t4 == b4)
  }
}
