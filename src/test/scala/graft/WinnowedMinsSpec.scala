package graft

import org.apache.spark.sql.functions._
import graft.expr.WinnowedMins
import graft.ext.TextStats

class WinnowedMinsSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: all k-gram KR hashes, min per w-window at
    * starts [0, max(m−w, 0)], distinct sorted. */
  private def reference(s: String, k: Int, w: Int): Seq[Long] = {
    val p = 1000000007L
    def kr(g: String): Long = g.codePoints().toArray
      .foldLeft(0L)((h, c) => (h * 257L + c) % p)
    val cps = s.codePoints().toArray
    val grams =
      if (cps.length < k) Array(kr(s))
      else (0 to cps.length - k).map(i => kr(new String(cps, i, k))).toArray
    val m = grams.length
    (0 to math.max(m - w, 0)).map(st =>
      grams.slice(st, math.min(st + w, m)).min).distinct.sorted
  }

  test("kernel matches the brute-force winnowing reference on random strings") {
    val rng = new scala.util.Random(5)
    val alphabet = "abcde fgh"
    val cases = (0 until 200).map { _ =>
      val len = rng.nextInt(40)
      (0 until len).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    } ++ Seq("", "a", "abcdefgh", "aaaaaaaaaaaaaaaa", "abcdefghij")
    cases.zipWithIndex.foreach { case (s, i) =>
      val got = Seq((1L, s)).toDF("id", "t")
        .select(WinnowedMins.winnowedMins(col("t"), 8, 4, rolling = true).as("fp"))
        .head().getSeq[Long](0)
      val want = reference(s, 8, 4)
      assert(got == want, s"case $i '$s': $got vs $want")
    }
  }

  test("xxhash64 variant: values equal xxhash64(substr) of the same grams") {
    // independent relational recomputation of the hot-path values
    val docs = Seq((1L, "The Quick  Brown Fox jumps over the lazy dog")).toDF("doc_id", "text")
    val got = TextStats.fingerprintRows(docs, "doc_id", "text")
      .select("fp").as[Long].collect().toSet
    val norm = lower(regexp_replace(col("text"), "\\s+", " "))
    val rel = docs
      .select(col("doc_id"), norm.as("nm"), length(norm).as("n"))
      .select(col("doc_id"), col("nm"), posexplode(sequence(lit(1), col("n") - 7)).as(Seq("ord", "i")))
      .withColumn("g", xxhash64(col("nm").substr(col("i"), lit(8))))
    val grams = rel.orderBy("ord").select("g").as[Long].collect()
    val m = grams.length
    val want = (0 to math.max(m - 4, 0)).map(s =>
      grams.slice(s, math.min(s + 4, m)).min).distinct.toSet
    assert(got == want)
  }

  test("unicode: multi-byte code points address the same grams as substr") {
    val s = "héllö wörld ünïcode tèst" // 2-byte chars interleaved
    val got = Seq((1L, s)).toDF("doc_id", "text")
    val viaExpr = TextStats.fingerprintRows(got, "doc_id", "text")
      .select("fp").as[Long].collect().toSet
    val norm = lower(regexp_replace(col("text"), "\\s+", " "))
    val rel = got
      .select(col("doc_id"), norm.as("nm"), length(norm).as("n"))
      .select(col("doc_id"), col("nm"), posexplode(sequence(lit(1), col("n") - 7)).as(Seq("ord", "i")))
      .withColumn("g", xxhash64(col("nm").substr(col("i"), lit(8))))
    val grams = rel.orderBy("ord").select("g").as[Long].collect()
    val m = grams.length
    val want = (0 to math.max(m - 4, 0)).map(st =>
      grams.slice(st, math.min(st + 4, m)).min).distinct.toSet
    assert(viaExpr == want)
  }

  test("null text: no rows; short text: whole-string fingerprint") {
    val df = Seq((1L, null: String), (2L, "ab")).toDF("doc_id", "text")
    val rows = TextStats.rollingFingerprintRows(df, "doc_id", "text").collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 2L)
    assert(rows(0).getLong(1) == (97L * 257 + 98) % 1000000007L)
  }
}
