package graft

import org.apache.spark.sql.functions._
import graft.ext.RandomProjection

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("signMatrix: deterministic, Achlioptas proportions, values in {-1,0,1}") {
    val r1 = RandomProjection.signMatrix(64, 16)
    val r2 = RandomProjection.signMatrix(64, 16)
    assert(r1.zip(r2).forall { case (a, b) => a.sameElements(b) }, "not deterministic")
    val flat = r1.flatten
    assert(flat.forall(v => v == 1.0 || v == -1.0 || v == 0.0))
    val n = flat.length.toDouble
    val (pos, neg, zero) =
      (flat.count(_ == 1.0) / n, flat.count(_ == -1.0) / n, flat.count(_ == 0.0) / n)
    // expected 1/6, 1/6, 2/3; 1024 cells → generous bands
    assert(pos > 0.10 && pos < 0.24, s"+1 fraction $pos")
    assert(neg > 0.10 && neg < 0.24, s"-1 fraction $neg")
    assert(zero > 0.55 && zero < 0.78, s"0 fraction $zero")
  }

  test("project: matches the local matrix-vector product exactly; wrong length nulls") {
    val rng = new scala.util.Random(31)
    val v = Array.fill(8)(rng.nextGaussian())
    val df = Seq(
      (1L, v.toSeq),
      (2L, Seq(1.0, 2.0))  // wrong length → null proj
    ).toDF("vec_id", "embedding")
    val out = RandomProjection.project(df, dim = 8, k = 3).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    val r = RandomProjection.signMatrix(8, 3)
    val scale = math.sqrt(3.0 / 3)
    val expect = (0 until 3).map { j =>
      // ascending-index sequential fold, mirroring the native dot product
      var acc = 0.0
      (0 until 8).foreach(i => acc += v(i) * r(j)(i))
      scale * acc
    }
    assert(out(2L) == null, "wrong-length vector must project to null")
    out(1L).zip(expect).foreach { case (got, want) =>
      assert(got == want, s"exact mirror drift: $got vs $want")
    }
  }

  test("JL property: pairwise squared distances preserved on average") {
    val rng = new scala.util.Random(47)
    val vecs = (0L until 60L).map(i => (i, Array.fill(64)(rng.nextGaussian()).toSeq))
    val proj = RandomProjection.project(vecs.toDF("vec_id", "embedding"), 64, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val orig = vecs.map { case (id, v) => id -> v.toArray }.toMap
    val ratios = for {
      i <- 0L until 60L; j <- (i + 1) until 60L
    } yield d2(proj(i), proj(j)) / d2(orig(i), orig(j))
    val mean = ratios.sum / ratios.size
    assert(mean > 0.85 && mean < 1.15, s"mean distance ratio $mean")
    assert(ratios.forall(r => !r.isNaN && r > 0.05 && r < 5.0),
      s"extreme ratio: ${ratios.min} .. ${ratios.max}")
  }

  test("determinism under repartitioning") {
    val rng = new scala.util.Random(53)
    val df = (0L until 40L).map(i => (i, Array.fill(16)(rng.nextGaussian()).toSeq))
      .toDF("vec_id", "embedding")
    val a = RandomProjection.project(df, 16, 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = RandomProjection.project(df.repartition(7), 16, 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b)
  }
}
