package graft

import graft.ext.Packing

class PackingSpec extends SparkSpec {
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
}
