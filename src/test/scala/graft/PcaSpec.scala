package graft

import org.apache.spark.sql.functions._
import graft.ext.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // anisotropic synthetic corpus: x = a*u + b*v + noise with known
  // orthogonal directions u, v and variances 25 >> 4 >> noise
  private def corpus(n: Int, dim: Int): Seq[(Long, Seq[Double])] = {
    val rng = new scala.util.Random(11)
    val u = Array.tabulate(dim)(i => if (i % 2 == 0) 1.0 else 0.0)
    val v = Array.tabulate(dim)(i => if (i % 2 == 1) 1.0 else 0.0)
    def nrm(a: Array[Double]) = { val s = math.sqrt(a.map(x => x * x).sum); a.map(_ / s) }
    val (un, vn) = (nrm(u), nrm(v))
    (0 until n).map { i =>
      val a = rng.nextGaussian() * 5; val b = rng.nextGaussian() * 2
      (i.toLong, Array.tabulate(dim)(d =>
        3.0 + a * un(d) + b * vn(d) + rng.nextGaussian() * 0.01).toSeq)
    }
  }

  test("covarianceMatrix: matches a local computation entry-by-entry") {
    val data = corpus(300, 6)
    val df = data.toDF("vec_id", "embedding").repartition(8)
    val got = Pca.covarianceMatrix(df, dim = 6).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val n = data.length
    val mean = Array.tabulate(6)(d => data.map(_._2(d)).sum / n)
    for (i <- 0 until 6; j <- i until 6) {
      val want = data.map(r => (r._2(i) - mean(i)) * (r._2(j) - mean(j))).sum / n
      assert(math.abs(got((i, j)) - want) < 1e-9, s"cov($i,$j): ${got((i, j))} vs $want")
    }
  }

  test("fit: components orthonormal, eigenvalues descending, top direction recovered") {
    val df = corpus(500, 8).toDF("vec_id", "embedding").repartition(8)
    val m = Pca.fitPcaWhitening(df, dim = 8, k = 3)
    assert(m.eigenvalues.zip(m.eigenvalues.tail).forall { case (a, b) => a >= b })
    for (r <- m.components.indices; s <- r until m.components.length) {
      val dot = m.components(r).zip(m.components(s)).map { case (a, b) => a * b }.sum
      val want = if (r == s) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"component dot($r,$s) = $dot")
    }
    // the top component must align with the planted even-coordinate direction
    val even = m.components(0).zipWithIndex.filter(_._2 % 2 == 0).map(_._1)
    val mass = even.map(x => x * x).sum
    assert(mass > 0.99, s"top component even-coordinate mass $mass")
  }

  test("whitened output: identity covariance, deterministic sign") {
    val df = corpus(600, 8).toDF("vec_id", "embedding").repartition(8)
    val m = Pca.fitPcaWhitening(df, dim = 8, k = 2)
    val w = Pca.transformPca(df, m, outCol = "w")
    // covariance of the whitened coordinates = I (population, eps-tolerant)
    val rows = w.select(col("w")(0).as("y0"), col("w")(1).as("y1"))
      .agg(avg("y0"), avg("y1"), avg(col("y0") * col("y0")),
        avg(col("y1") * col("y1")), avg(col("y0") * col("y1"))).head()
    val (m0, m1) = (rows.getDouble(0), rows.getDouble(1))
    assert(math.abs(m0) < 1e-9 && math.abs(m1) < 1e-9)
    assert(math.abs(rows.getDouble(2) - m0 * m0 - 1.0) < 1e-6)
    assert(math.abs(rows.getDouble(3) - m1 * m1 - 1.0) < 1e-6)
    assert(math.abs(rows.getDouble(4) - m0 * m1) < 1e-6)
    // re-fit = identical components (sign canonicalization)
    val m2 = Pca.fitPcaWhitening(df, dim = 8, k = 2)
    assert(m.components.flatten.toSeq == m2.components.flatten.toSeq)
  }

  test("wrong-length vectors: excluded from fit, null-flagged in transform") {
    val good = corpus(100, 4)
    val df = (good :+ (999L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
    val m = Pca.fitPcaWhitening(df, dim = 4, k = 2)
    val out = Pca.transformPca(df, m)
    assert(out.filter(!col("pca_ok")).count() == 1)
    assert(out.filter(col("vec_id") === 999L).head().isNullAt(
      out.columns.indexOf("pca")))
    intercept[IllegalArgumentException] { Pca.fitPcaWhitening(df, dim = 4, k = 5) }
  }
}
