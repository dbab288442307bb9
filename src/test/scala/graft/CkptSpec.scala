package graft

import org.apache.spark.sql.functions._

/** Cluster-reality pass over [[graft.core.Ckpt.pin]] (round-8 verdict
  * task 5): `localCheckpoint` is executor-loss-unsafe, and the iterative
  * operators (BSP connected components, the BPE dict loop, scored
  * frames, the streaming signature pin) all rely on pin. The policy —
  * a session with a RELIABLE checkpoint directory routes every pin
  * through `df.checkpoint()` — must actually hold end-to-end: this spec
  * runs the deepest pin consumer (the pointer-jumping BSP loop, several
  * pins per round) plus the streaming batch processor under a configured
  * checkpoint dir and asserts both the results and that reliable
  * checkpoint data was materialized in the directory.
  *
  * The checkpoint dir lives on the shared SparkContext; the spec
  * restores the unset state afterwards (`setCheckpointDir(null)` maps
  * through `Option(null)` to None — the same restore DedupSpec uses) so
  * the rest of the suite keeps the fast local-checkpoint path.
  */
class CkptSpec extends SparkSpec {
  import spark.implicits._

  test("BSP components + streaming batch run on reliable checkpoints when a dir is set") {
    val dir = java.nio.file.Files.createTempDirectory("graft_reliable_ckpt")
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "suite session unexpectedly already has a checkpoint dir")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      // pin itself routes to reliable checkpoint: the plan becomes a scan
      // over checkpointed data, not a LocalTableScan/localCheckpoint RDD
      val pinned = graft.core.Ckpt.pin(Seq((1L, "x")).toDF("id", "v"))
      assert(pinned.collect().map(_.getLong(0)).toSeq == Seq(1L))

      // the deepest pin consumer: pointer-jumping BSP loop, pins per round
      val edges = Seq(
        (1L, 2L), (2L, 3L), (3L, 4L), // chain -> component 1
        (10L, 11L), // pair -> component 10
        (20L, 21L), (21L, 22L), (20L, 22L)) // triangle -> component 20
        .toDF("doc_a", "doc_b")
      val comps = graft.ext.Dedup.connectedComponents(edges)
        .as[(Long, Long)].collect().toMap
      assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L), s"$comps")

      // the streaming batch processor's pins run under the same policy
      val tmp = java.nio.file.Files.createTempDirectory("graft_ckpt_stream")
      val b = Seq((1L, "alpha words here"), (2L, "alpha words here"))
        .toDF("doc_id", "text")
      streaming.StreamOps.processNearDedupBatch(
        b, s"$tmp/sink", s"$tmp/state", "doc_id", "text", 3)
      val sinkIds = spark.read.parquet(s"$tmp/sink").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(sinkIds == Set(1L), s"exact-dup batch should admit min id only: $sinkIds")
      graft.core.Fs.rmTree(tmp)

      // reliable checkpoint data actually materialized in the configured dir
      val walk = java.nio.file.Files.walk(dir)
      val ckptFiles =
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala.count(p => java.nio.file.Files.isRegularFile(p))
        } finally walk.close()
      assert(ckptFiles > 0, "no reliable checkpoint files were written — pin did not route")
    } finally {
      spark.sparkContext.setCheckpointDir(null)
      graft.core.Fs.rmTree(dir)
    }
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
  }
}
