package graft

import org.apache.spark.sql.functions._
import graft.expr.TokenGramHashes.tokenGramHashes

class TokenGramExprSpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation of the kernel, independent of Catalyst. */
  private def ref(toks: Seq[String], k: Int): Seq[Long] = {
    if (toks.length < k) Seq.empty
    else (0 to toks.length - k).map { i =>
      var h = 0xcbf29ce484222325L
      for (j <- 0 until k; b <- toks(i + j).getBytes("UTF-8")) {
        h ^= (b & 0xff).toLong; h *= 0x100000001b3L
      }
      // separator per token
      var h2 = 0xcbf29ce484222325L
      for (j <- 0 until k) {
        for (b <- toks(i + j).getBytes("UTF-8")) { h2 ^= (b & 0xff).toLong; h2 *= 0x100000001b3L }
        h2 ^= 0x1fL; h2 *= 0x100000001b3L
      }
      h2
    }
  }

  test("expression equals the reference kernel, codegen and interpreted") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 60).map { i =>
      val n = rng.nextInt(12)
      (i.toLong, (0 until n).map(_ => rng.alphanumeric.take(1 + rng.nextInt(6)).mkString))
    }
    val df = rows.toDF("id", "toks")
    for (k <- Seq(1, 3, 5)) {
      val got = df.select($"id", tokenGramHashes($"toks", k).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      rows.foreach { case (id, toks) =>
        assert(got(id) == ref(toks, k), s"k=$k id=$id toks=$toks")
      }
      // interpreted path (codegen off) agrees
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      try {
        val gi = df.select($"id", tokenGramHashes($"toks", k).as("h"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        assert(gi == got, s"interpreted != codegen at k=$k")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("unicode tokens hash by UTF-8 bytes; boundaries stay distinct") {
    val df = Seq(
      (1L, Seq("héllo", "wörld")),      // multi-byte
      (2L, Seq("ab", "c")),
      (3L, Seq("a", "bc"))
    ).toDF("id", "toks")
    val out = df.select($"id", tokenGramHashes($"toks", 2).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L) == ref(Seq("héllo", "wörld"), 2))
    assert(out(2L) != out(3L), "token-boundary shift must change the gram hash")
  }

  test("short arrays emit empty, never null; null input stays null") {
    val df = Seq((1L, Seq("only")), (2L, Seq.empty[String]))
      .toDF("id", "toks")
      .union(Seq((3L, null)).toDF("id", "toks"))
    val out = df.select($"id", tokenGramHashes($"toks", 2).as("h")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(out(1L) == Seq.empty && out(2L) == Seq.empty)
    assert(out(3L) == null)
  }

  test("SimHashReplayWord equals the Catalyst expression form it replaced") {
    // the retired 64-subexpression tree, reconstructed verbatim: kr in its
    // own projection, per-bit top-half tests of (kr * A_j) mod p
    val p = 1000000007L
    val kr = col("kr")
    val assembled = (0 until 64).map { j =>
      val aj = 2654435761L * (j + 1) % p
      shiftleft(when(pmod(kr * lit(aj), lit(p)) > lit(p / 2), lit(1L))
        .otherwise(lit(0L)), j)
    }.reduce(_.bitwiseOR(_))
    val toks = Seq("", "a", "z", "hello", "the", "0123456789",
      "repeated-repeated-repeated", "MiXeD", "café", "über",
      "a b", "trailing ") ++ (0 until 50).map(i => s"tok$i word${i * 7}")
    val df = toks.toDF("tok")
      // rollingHashExpr: the RETIRED Catalyst fold — the reference stays
      // independent of the native KarpRabinHash both fused paths share
      .withColumn("kr", graft.ext.TextStats.rollingHashExpr(col("tok")))
      .withColumn("old", assembled)
      .withColumn("neu", graft.expr.SimHashReplayWord.simhashReplayWord(col("tok")))
    val rows = df.select("tok", "old", "neu").collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"mismatch for '${r.getString(0)}'")
    }
    // null token → null word (nullSafeEval)
    val n = Seq((1L, null: String)).toDF("id", "tok")
      .select(graft.expr.SimHashReplayWord.simhashReplayWord($"tok")).head()
    assert(n.isNullAt(0))
  }

  test("KarpRabinHash equals the Catalyst fold it replaced") {
    // the token battery of the SimHash pin plus gram-shaped inputs
    // (spaces — the HLL surrogate hashes multi-token grams) and the
    // empty-string → 0 convention
    val toks = Seq("", "a", "z", "hello", "the", "0123456789",
      "repeated-repeated-repeated", "MiXeD", "café", "über",
      "a b", "two gram", "three gram here", "trailing ") ++
      (0 until 50).map(i => s"tok$i word${i * 7}")
    val rows = toks.toDF("tok")
      .withColumn("old", graft.ext.TextStats.rollingHashExpr(col("tok")))
      .withColumn("neu", graft.ext.TextStats.rollingHash(col("tok")))
      .select("tok", "old", "neu").collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"mismatch for '${r.getString(0)}'")
    }
    assert(rows.find(_.getString(0) == "").get.getLong(2) == 0L)
    // null input → null hash (nullSafeEval)
    val n = Seq((1L, null: String)).toDF("id", "tok")
      .select(graft.ext.TextStats.rollingHash($"tok")).head()
    assert(n.isNullAt(0))
  }

  test("KarpRabinHash stays inside whole-stage codegen") {
    val df = spark.range(10)
      .select(concat(lit("tok"), $"id".cast("string")).as("tok"))
      .select(graft.ext.TextStats.rollingHash($"tok").as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("karprabinhash")), plan)
    assert(df.count() == 10)
  }

  test("SimHashReplayWord stays inside whole-stage codegen") {
    val df = spark.range(10)
      .select(concat(lit("tok"), $"id".cast("string")).as("tok"))
      .select(graft.expr.SimHashReplayWord.simhashReplayWord($"tok").as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("simhashreplayword")), plan)
    assert(df.count() == 10)
  }

  test("stays inside whole-stage codegen") {
    // a non-foldable source, or constant folding evaluates the whole
    // projection at plan time and leaves only a LocalTableScan
    val df = spark.range(10)
      .select(split(concat_ws(" ", lit("a"), lit("b"), $"id".cast("string")), " ").as("toks"))
      .select(tokenGramHashes($"toks", 2).as("h"))
    // the '*(n)' prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("tokengramhashes")), plan)
    assert(df.count() == 10)
  }
}
