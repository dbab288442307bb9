package graft

import graft.ext.LabelProp

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  test("frontier advances one hop per iteration along a chain") {
    // a(seed x) - b - c - d
    val seeds = Seq((1L, Some("x")), (2L, None), (3L, None), (4L, None))
      .toDF("doc_id", "label")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    def labeled(iters: Int) =
      LabelProp.propagate(seeds, pairs, iters)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("label"), r.getAs[String]("origin"))).toMap
    val one = labeled(1)
    assert(one == Map(1L -> ("x", "seed"), 2L -> ("x", "propagated")), s"got $one")
    val three = labeled(3)
    assert(three.keySet == Set(1L, 2L, 3L, 4L) &&
      three.values.map(_._1).forall(_ == "x"), s"got $three")
    assert(three(4L)._2 == "propagated")
  }

  test("equal-weight tie breaks to the smaller label; seeds stay clamped") {
    // a(x) - b - c(y): b ties x vs y at w=1 each -> x
    val seeds = Seq((1L, Some("x")), (2L, None), (3L, Some("y")))
      .toDF("doc_id", "label")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = LabelProp.propagate(seeds, pairs, iters = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("label")).toMap
    assert(out == Map(1L -> "x", 2L -> "x", 3L -> "y"), s"got $out")
  }

  test("weighted vote beats the tie rule") {
    val seeds = Seq((1L, Some("x")), (2L, None), (3L, Some("y")))
      .toDF("doc_id", "label")
    val pairs = Seq((1L, 2L, 0.3), (2L, 3L, 0.9)).toDF("doc_a", "doc_b", "w")
    val out = LabelProp.propagate(seeds, pairs, iters = 2, wCol = Some("w"))
      .filter($"doc_id" === 2L).collect()(0).getAs[String]("label")
    assert(out == "y", s"got $out")
  }

  test("unreached vertices are absent; isolated seeds survive") {
    val seeds = Seq((1L, Some("x")), (9L, Some("z")), (5L, None))
      .toDF("doc_id", "label")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val out = LabelProp.propagate(seeds, pairs, iters = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("label")).toMap
    // 5 has no edges and no label: absent; 9 is an isolated seed: present
    assert(out == Map(1L -> "x", 2L -> "x", 9L -> "z"), s"got $out")
  }

  test("validation") {
    val seeds = Seq((1L, "x")).toDF("doc_id", "label")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    intercept[IllegalArgumentException](LabelProp.propagate(seeds, pairs, iters = 0))
  }
}
