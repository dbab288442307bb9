package graft

import org.apache.spark.sql.functions._
import graft.ext.{Sampling, TextStats}

class UrlMixtureSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "read https://news.example.org/a and https://News.Example.org/b today"),
    (2L, "mirror at http://cdn.example.org:8080/x plus https://other.net"),
    (3L, "bare www.nolink.com is not scheme-anchored; ftp://x.y neither"),
    (4L, "see https://tracker.ads.net/p?q=1 end")
  ).toDF("doc_id", "text")

  test("urlDomainStats: counts per lowercased host, docs counted once") {
    val stats = TextStats.urlDomainStats(docs).orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(stats.toSeq == Seq(
      ("cdn.example.org", 1L, 1L),
      ("news.example.org", 2L, 1L),
      ("other.net", 1L, 1L),
      ("tracker.ads.net", 1L, 1L)))
  }

  test("dropBlockedDomains: exact host and subdomain match, case-insensitive") {
    val kept = TextStats.dropBlockedDomains(docs, Seq("ads.net"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L, 3L), "tracker.ads.net is a subdomain of ads.net")
    val kept2 = TextStats.dropBlockedDomains(docs, Seq("EXAMPLE.ORG"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept2.toSeq == Seq(3L, 4L))
    // no-scheme text and null text survive
    val withNull = docs.union(Seq((5L, null: String)).toDF("doc_id", "text"))
    assert(TextStats.dropBlockedDomains(withNull, Seq("nolink.com")).count() == 5)
  }

  test("domainMixtureWeights: tau=1 natural shares, tau=0.5 flattens, rate clipped") {
    val df = Seq(
      ("web", 900L), ("web", 700L),   // 1600 tokens
      ("books", 300L), ("books", 100L) // 400 tokens
    ).toDF("source", "toks")
    val w1 = Sampling.domainMixtureWeights(df, "source", col("toks"), temperature = 1.0)
      .orderBy("domain").collect()
    assert(w1.map(_.getAs[String]("domain")).toSeq == Seq("books", "web"))
    assert(math.abs(w1(0).getAs[Double]("weight") - 0.2) < 1e-12)
    assert(math.abs(w1(1).getAs[Double]("weight") - 0.8) < 1e-12)
    assert(w1(0).getAs[Long]("n_docs") == 2 && w1(0).getAs[Long]("n_tokens") == 400)

    val w5 = Sampling.domainMixtureWeights(df, "source", col("toks"), temperature = 0.5)
      .orderBy("domain").collect()
    val books5 = w5(0).getAs[Double]("weight")
    assert(books5 > 0.2 && books5 < 0.5, s"tau=0.5 must lift the small domain: $books5")
    assert(math.abs(w5.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-12)

    // target larger than the corpus: every rate clips to 1 for the domain
    // whose share exceeds its size; exact arithmetic for the other
    val r = Sampling.domainMixtureWeights(df, "source", col("toks"),
        temperature = 1.0, targetTokens = Some(1000L))
      .orderBy("domain").collect()
    assert(math.abs(r(0).getAs[Double]("sampling_rate") - 0.2 * 1000 / 400) < 1e-12)
    assert(math.abs(r(1).getAs[Double]("sampling_rate") - 0.8 * 1000 / 1600) < 1e-12)
    val clipped = Sampling.domainMixtureWeights(df, "source", col("toks"),
        temperature = 1.0, targetTokens = Some(10000L))
      .agg(max("sampling_rate")).head().getDouble(0)
    assert(clipped == 1.0, "rates must clip at 1")
  }

  test("domainMixtureWeights: guards") {
    val df = Seq(("a", 1L)).toDF("source", "toks")
    intercept[IllegalArgumentException] {
      Sampling.domainMixtureWeights(df, "source", col("toks"), temperature = 0.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.domainMixtureWeights(df, "source", col("toks"), targetTokens = Some(0L))
    }
  }
}
