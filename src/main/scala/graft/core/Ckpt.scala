package graft.core

import org.apache.spark.sql.DataFrame

/** Plan pinning with a cluster-grade escape hatch.
  *
  * Several iterative / multi-consumer pipelines (LSH signature frame,
  * connected-components state, winnowing fingerprint frame) must
  * materialize a frame ONCE and hand every consumer a leaf — both to
  * truncate exponentially-growing loop lineage and to stop ReuseExchange-
  * dependent plans from re-executing a corpus-wide pass per consumer
  * (see ARCHITECTURE.md, round-4 plan audit).
  *
  * `localCheckpoint` does that with executor-local storage: right for
  * local[] and for clusters where re-running the job on executor loss is
  * acceptable. On a long 100 TB run it is NOT loss-resilient — losing an
  * executor invalidates the checkpointed partitions and fails the job.
  * When the session has a reliable checkpoint directory configured
  * (`spark.sparkContext.setCheckpointDir(...)` — typically HDFS/S3),
  * [[pin]] routes to `df.checkpoint()` instead, which survives executor
  * loss at the cost of a distributed write. The choice is the caller's
  * cluster policy, expressed through the standard Spark knob rather than
  * a library-private flag.
  */
object Ckpt {

  /** Materialize `df` eagerly and return a plan leaf: reliable
    * `checkpoint()` when a checkpoint dir is set on the session's
    * context, else `localCheckpoint()`. The reliable path persists
    * around the checkpoint — without it the eager materialization job
    * and the ReliableCheckpointRDD write job each recompute the full
    * upstream plan, doubling exactly the corpus-wide passes pinning is
    * meant to run once (the standard persist-then-checkpoint recipe from
    * the RDD.checkpoint contract). */
  def pin(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      df.persist()
      try df.checkpoint(eager = true)
      finally df.unpersist()
    } else df.localCheckpoint(eager = true)
}
