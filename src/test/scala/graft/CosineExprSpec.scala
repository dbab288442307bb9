package graft

import org.apache.spark.sql.functions._
import graft.expr.CosineSimilarity.cosineSim
import graft.ext.Dedup

class CosineExprSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int, seed: Int) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rng.nextGaussian())))
      .toDF("id", "a")
      .withColumn("b", reverse(col("a")))
  }

  test("native expression equals the HOF composition") {
    val df = vecs(200, 32, 3)
    val d = df.select(
      cosineSim($"a", $"b").as("native"),
      Dedup.cosineHof($"a", $"b").as("hof"))
      .withColumn("diff", abs($"native" - $"hof"))
      .agg(max("diff")).head().getDouble(0)
    assert(d < 1e-12, s"max diff $d")
  }

  test("known values: identical=1, orthogonal=0, opposite=-1") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0), 1.0),
      (Array(1.0, 0.0), Array(0.0, 1.0), 0.0),
      (Array(1.0, -2.0), Array(-1.0, 2.0), -1.0)
    ).toDF("a", "b", "want")
    df.select(cosineSim($"a", $"b").as("got"), $"want").collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("null propagates, zero vector yields NaN like the HOF version") {
    val df = Seq((Some(Array(1.0, 2.0)), None: Option[Array[Double]]),
      (Some(Array(0.0, 0.0)), Some(Array(1.0, 2.0)))).toDF("a", "b")
    val rows = df.select(cosineSim($"a", $"b")).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0).isNaN)
  }

  test("null ELEMENT yields null, matching the HOF composition (both paths)") {
    // interpreted path (local relation) and codegen path (parquet scan)
    val data = Seq(
      (1L, Array[java.lang.Double](1.0, null, 3.0), Array[java.lang.Double](1.0, 2.0, 3.0)),
      (2L, Array[java.lang.Double](1.0, 2.0, 3.0), Array[java.lang.Double](1.0, 2.0, null)),
      (3L, Array[java.lang.Double](1.0, 2.0, 3.0), Array[java.lang.Double](3.0, 2.0, 1.0)))
    val local = data.toDF("id", "a", "b")
    val tmp = java.nio.file.Files.createTempDirectory("cos_null").toString
    local.write.mode("overwrite").parquet(tmp)
    for (df <- Seq(local, spark.read.parquet(tmp))) {
      val rows = df.orderBy("id").select(
        cosineSim($"a", $"b").as("native"),
        Dedup.cosineHof($"a", $"b").as("hof"),
        graft.expr.DotProduct.dotProduct($"a", $"b").as("dot")).collect()
      assert(rows(0).isNullAt(0) && rows(0).isNullAt(1) && rows(0).isNullAt(2))
      assert(rows(1).isNullAt(0) && rows(1).isNullAt(1) && rows(1).isNullAt(2))
      assert(!rows(2).isNullAt(0) && math.abs(rows(2).getDouble(0) - rows(2).getDouble(1)) < 1e-12)
    }
  }

  test("length mismatch yields null, matching zip_with padding (both paths)") {
    val data = Seq(
      (1L, Array(1.0, 2.0, 3.0), Array(1.0, 2.0)),
      (2L, Array(1.0, 2.0), Array(1.0, 2.0, 3.0)),
      (3L, Array(1.0, 2.0), Array(2.0, 1.0)))
    val local = data.toDF("id", "a", "b")
    val tmp = java.nio.file.Files.createTempDirectory("cos_len").toString
    local.write.mode("overwrite").parquet(tmp)
    for (df <- Seq(local, spark.read.parquet(tmp))) {
      val rows = df.orderBy("id").select(
        cosineSim($"a", $"b").as("native"),
        Dedup.cosineHof($"a", $"b").as("hof"),
        graft.expr.DotProduct.dotProduct($"a", $"b").as("dot")).collect()
      assert(rows(0).isNullAt(0) && rows(0).isNullAt(1) && rows(0).isNullAt(2))
      assert(rows(1).isNullAt(0) && rows(1).isNullAt(1) && rows(1).isNullAt(2))
      assert(!rows(2).isNullAt(0) && math.abs(rows(2).getDouble(0) - rows(2).getDouble(1)) < 1e-12)
    }
  }

  test("dot product expression equals the HOF composition") {
    val df = vecs(100, 16, 4)
    val d = df.select(
      graft.expr.DotProduct.dotProduct($"a", $"b").as("native"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0d), (acc, v) => acc + v).as("hof"))
      .withColumn("diff", abs($"native" - $"hof"))
      .agg(max("diff")).head().getDouble(0)
    assert(d < 1e-12, s"max diff $d")
  }

  test("the expression participates in whole-stage codegen") {
    // local relations constant-fold to LocalTableScan; go through parquet
    val tmp = java.nio.file.Files.createTempDirectory("cos_wsc").toString
    vecs(50, 8, 1).write.mode("overwrite").parquet(tmp)
    val src = spark.read.parquet(tmp)
    val plan = src.select(cosineSim($"a", $"b").as("c"))
      .queryExecution.executedPlan.toString
    // "*(n)" marks a WholeStageCodegen stage; the expression must sit
    // inside one (a CodegenFallback expr would break the project out)
    assert(plan.contains("*(1) Project [cosinesimilarity"), plan)
  }
}
