package graft

import graft.ext.TextRank

class TextRankSpec extends SparkSpec {
  import spark.implicits._

  test("cooccurrenceEdges: path graph edges, weights, and out-weights") {
    val docs = Seq((1L, "aa bb cc")).toDF("doc_id", "text")
    val e = TextRank.cooccurrenceEdges(docs, window = 1)
      .collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("dst"),
        r.getAs[Long]("w"), r.getAs[Long]("out_w"))).toSet
    assert(e == Set(("aa", "bb", 1L, 1L), ("bb", "aa", 1L, 2L),
      ("bb", "cc", 1L, 2L), ("cc", "bb", 1L, 1L)), s"got $e")
  }

  test("filter-then-window: short tokens drop out and adjacency closes over them") {
    // "a" (len 1) is filtered BEFORE windowing, so bb and cc become
    // window-1 neighbors across the removed token
    val docs = Seq((1L, "bb a cc")).toDF("doc_id", "text")
    val e = TextRank.cooccurrenceEdges(docs, window = 1)
      .select("src", "dst").as[(String, String)].collect().toSet
    assert(e == Set(("bb", "cc"), ("cc", "bb")), s"got $e")
  }

  test("repeated-word self-pairs produce no edges; isolated terms are unranked") {
    val docs = Seq((1L, "dd dd"), (2L, "ee")).toDF("doc_id", "text")
    assert(TextRank.cooccurrenceEdges(docs, window = 1).count() == 0)
    assert(TextRank.textRankScores(docs, window = 1, iters = 2).count() == 0)
  }

  test("symmetric 2-node graph is a fixed point at score 1.0") {
    val docs = Seq((1L, "xx yy")).toDF("doc_id", "text")
    val s = TextRank.textRankScores(docs, window = 1, iters = 3)
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Double]("rank_score"))
      .toMap
    assert(s == Map("xx" -> 1.0, "yy" -> 1.0), s"got $s")
  }

  test("hand-computed two iterations on the aa-bb-cc path") {
    // ratios: aa->bb 1, bb->aa .5, bb->cc .5, cc->bb 1; d = 0.85, s0 = 1
    // iter 1: s(aa)=s(cc)=0.15+0.85*0.5=0.575, s(bb)=0.15+0.85*2=1.85
    // iter 2: s(aa)=s(cc)=0.15+0.85*(0.5*1.85)=0.93625
    //         s(bb)=0.15+0.85*(0.575+0.575)=1.1275
    val docs = Seq((1L, "aa bb cc")).toDF("doc_id", "text")
    val s = TextRank.textRankScores(docs, window = 1, iters = 2)
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Double]("rank_score"))
      .toMap
    assert(math.abs(s("aa") - 0.93625) < 1e-9, s"got $s")
    assert(math.abs(s("bb") - 1.1275) < 1e-9, s"got $s")
    assert(math.abs(s("cc") - 0.93625) < 1e-9, s"got $s")
  }

  test("topKeywords: (score desc, term asc) cut is deterministic") {
    val docs = Seq((1L, "aa bb cc")).toDF("doc_id", "text")
    val top = TextRank.topKeywords(docs, k = 2, window = 1, iters = 2)
      .collect().map(_.getAs[String]("term"))
    // bb leads; the aa/cc tie breaks to aa
    assert(top.sameElements(Array("bb", "aa")), s"got ${top.toSeq}")
    val again = TextRank.topKeywords(docs, k = 2, window = 1, iters = 2)
      .collect().map(_.getAs[String]("term"))
    assert(top.sameElements(again))
  }

  test("window=2 adds the skip-gram edge") {
    val docs = Seq((1L, "aa bb cc")).toDF("doc_id", "text")
    val e = TextRank.cooccurrenceEdges(docs, window = 2)
      .select("src", "dst").as[(String, String)].collect().toSet
    assert(e.contains(("aa", "cc")) && e.contains(("cc", "aa")), s"got $e")
  }

  test("null text and empty docs are ignored") {
    val docs = Seq((1L, "aa bb"), (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("doc_id", "text")
    val s = TextRank.textRankScores(docs, window = 1, iters = 1)
      .collect().map(_.getAs[String]("term")).toSet
    assert(s == Set("aa", "bb"), s"got $s")
  }
}
