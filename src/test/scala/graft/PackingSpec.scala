package graft

import graft.ext.Packing

class PackingSpec extends SparkSpec {

  test("chunkByTokenBudget: hand-checked windows, overlap, trailing-window rule") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens
      (2L, "x y")                  // short: one chunk of itself
    ).toDF("doc_id", "text")
    val chunks = Packing.chunkByTokenBudget(docs, maxTokens = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap
    // step 3: starts 0,3,6 — start 9 adds no new token (9+1 !< 10), dropped
    assert(chunks.keySet == Set((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L)), s"$chunks")
    assert(chunks((1L, 0L)) == ("a b c d", 4L))
    assert(chunks((1L, 1L)) == ("d e f g", 4L)) // overlap: 'd' repeats
    assert(chunks((1L, 2L)) == ("g h i j", 4L))
    assert(chunks((2L, 0L)) == ("x y", 2L))
    // zero overlap: clean partition, ragged tail chunk
    val nz = Packing.chunkByTokenBudget(docs, maxTokens = 4, overlap = 0)
      .filter($"doc_id" === 1L).collect()
      .map(r => r.getLong(1) -> ((r.getString(2), r.getLong(3)))).toMap
    assert(nz(0L) == ("a b c d", 4L) && nz(1L) == ("e f g h", 4L) &&
      nz(2L) == ("i j", 2L), s"$nz")
    intercept[IllegalArgumentException] {
      Packing.chunkByTokenBudget(docs, maxTokens = 4, overlap = 4)
    }
  }
  import spark.implicits._

  test("packByTokenBudget assigns packs by preceding cumulative tokens") {
    // priors: 0, 100, 300, 550 at capacity 300 -> packs 0, 0, 1, 1
    val docs = Seq((1L, 100L), (2L, 200L), (3L, 250L), (4L, 100L))
      .toDF("doc_id", "toks").withColumn("g", org.apache.spark.sql.functions.lit("a"))
    val packed = Packing.packByTokenBudget(docs, "toks", "doc_id", 300, Some("g"))
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(packed == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L), s"$packed")
    val summary = Packing.packSummary(
        Packing.packByTokenBudget(docs, "toks", "doc_id", 300, Some("g")),
        "toks", Some("g"))
      .select("pack_id", "n_docs", "sum_tokens")
      .as[(Long, Long, Long)].collect().toSet
    assert(summary == Set((0L, 2L, 300L), (1L, 2L, 350L)), s"$summary")
  }

  test("groups pack independently; no-group packs one sequence; bad capacity throws") {
    val docs = Seq(("a", 1L, 300L), ("a", 2L, 300L), ("b", 3L, 10L))
      .toDF("g", "doc_id", "toks")
    val byGroup = Packing.packByTokenBudget(docs, "toks", "doc_id", 300, Some("g"))
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    // each group restarts at pack 0
    assert(byGroup == Map(1L -> 0L, 2L -> 1L, 3L -> 0L), s"$byGroup")
    val global = Packing.packByTokenBudget(docs, "toks", "doc_id", 300, None)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(global == Map(1L -> 0L, 2L -> 1L, 3L -> 2L), s"$global")
    intercept[IllegalArgumentException](
      Packing.packByTokenBudget(docs, "toks", "doc_id", 0, None))
  }

  // independent Karp-Rabin fold, same family as TextStats.rollingHash,
  // composed over the gram's member-token hashes as the operator does
  private def kr(s: String): Long =
    s.foldLeft(0L)((h, c) => (h * 257 + c.toInt) % 1000000007L)
  private def gramHash(toks: Seq[String]): Long =
    toks.map(kr).reduceLeft((a, b) => (a * 257 + b) % 1000000007L)

  test("contentDefinedChunks: boundaries match an independent hash fold; lossless") {
    val k = 2; val div = 4
    val toks = (1 to 30).map(i => s"w$i")
    val docs = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    // expected: boundary after pos i when kr(gram ending at i) % div == 0
    val bounds = (k - 1 until toks.length)
      .filter(i => gramHash(toks.slice(i - k + 1, i + 1)) % div == 0)
    assert(bounds.nonEmpty && bounds.length < toks.length, s"fixture dull: $bounds")
    val expChunks = {
      val cuts = (-1 +: bounds) :+ (toks.length - 1)
      cuts.sliding(2).filter(p => p(1) > p(0))
        .map(p => toks.slice(p(0) + 1, p(1) + 1).mkString(" ")).toSeq
    }
    val got = Packing.contentDefinedChunks(docs, gramTokens = k, divisor = div)
      .orderBy("chunk_id")
      .select("chunk_text").as[String].collect().toSeq
    assert(got == expChunks, s"got $got want $expChunks")
    // lossless partition: chunks in order reassemble the token stream
    assert(got.mkString(" ") == toks.mkString(" "))
  }

  test("contentDefinedChunks: head insertion re-synchronizes (CDC stability)") {
    val k = 2; val div = 4
    val toks = (1 to 40).map(i => s"w$i")
    val docs = Seq(
      (1L, toks.mkString(" ")),
      (2L, ("zzz" +: toks).mkString(" "))).toDF("doc_id", "text")
    val byDoc = Packing.contentDefinedChunks(docs, gramTokens = k, divisor = div)
      .select("doc_id", "chunk_text").as[(Long, String)].collect()
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).toSet }
    // every chunk of the original after its first boundary reappears
    // verbatim in the shifted doc — fixed-width chunking shares none
    val a = Packing.contentDefinedChunks(docs.filter($"doc_id" === 1L),
      gramTokens = k, divisor = div).orderBy("chunk_id")
      .select("chunk_text").as[String].collect().toSeq
    assert(a.drop(1).toSet.subsetOf(byDoc(2L)), s"resync failed: $a vs ${byDoc(2L)}")
  }

  test("contentDefinedChunks: short docs are one chunk, null text none, validation") {
    val docs = Seq((1L, "solo"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Packing.contentDefinedChunks(docs, gramTokens = 4, divisor = 8)
      .collect()
    assert(out.length == 1 && out(0).getAs[String]("chunk_text") == "solo" &&
      out(0).getAs[Long]("n_tokens") == 1L && out(0).getAs[Long]("start_pos") == 0L)
    intercept[IllegalArgumentException](
      Packing.contentDefinedChunks(docs, gramTokens = 0, divisor = 8))
    intercept[IllegalArgumentException](
      Packing.contentDefinedChunks(docs, gramTokens = 2, divisor = 0))
  }
}
