package graft

import org.apache.spark.sql.SparkSession

/** Generic compile-vs-execute attribution for any driver query (the
  * ProbeLagCorr decomposition, generalized): a bench number is
  * `build + analyze/optimize + codegen + execute`, and only the last
  * term scales with data. A query whose execution is a small fraction
  * of its fresh end-to-end time is COMPILE/BUILD-bound — a fixed
  * per-call cost that amortizes to zero at 100 TB — and should not be
  * "optimized" by touching its data path.
  *
  * Measurement caveat that shaped the columns: re-running the SAME
  * DataFrame reuses shuffle map outputs (only post-shuffle stages
  * re-run), so the repeat column is a final-stage lower bound, NOT the
  * execution cost. The honest full-execution figure is
  * `fresh − build − plan` (a fresh DataFrame creates new exchanges —
  * no shuffle reuse — while codegen stays cached for identical
  * source), reported as `exec`.
  *
  * The timed ACTION is the bench's noop write, NOT `.collect()` —
  * round-10 lesson (ProbeWbAttrib): for queries with corpus-sized
  * OUTPUT (q_weighted_bins_lineitem emits per-row bins, ≈ 560k rows at
  * sf0.1) a collect pays seconds of driver-side row materialization
  * the bench never measures, which made two rounds of attribution
  * tables read ~2× the clean bench on exactly that query. Attribution
  * must time the same action the number it explains times.
  *
  * Usage: `runMain graft.ProbeCompile q_name [q_name2 ...]`, or
  * `runMain graft.ProbeCompile all` for the whole suite (the committed
  * `bench_r7_attribution.txt` artifact).
  */
object ProbeCompile {
  def main(args0: Array[String]): Unit = {
    require(args0.nonEmpty, "pass query names or 'all'")
    val args: Array[String] =
      if (args0.sameElements(Array("all"))) SparkEntry.queries.keys.toArray.sorted
      else args0
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def nanos(run: => Unit): Double = {
      val t0 = System.nanoTime(); run; (System.nanoTime() - t0) / 1e9
    }
    def act(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    println(f"${"query"}%-32s ${"build"}%6s ${"plan"}%6s ${"laststg"}%7s ${"fresh"}%6s ${"exec"}%6s  verdict")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm scan + memo caches + codegen
      val tBuild = nanos { fn(spark, sfDir) }
      val df = fn(spark, sfDir)
      val tPlan = nanos { df.queryExecution.executedPlan }
      act(df) // pin this plan's codegen + shuffle outputs
      val tLast = (1 to 3).map(_ => nanos { act(df) }).min
      val tFresh = (1 to 2).map(_ => nanos { act(fn(spark, sfDir)) }).min
      val tExec = math.max(0.0, tFresh - tBuild - tPlan)
      val verdict =
        if (tExec < 0.35 * tFresh) "COMPILE/BUILD-bound (amortizes at scale)"
        else "data-bound"
      println(f"$name%-32s $tBuild%6.2f $tPlan%6.2f $tLast%7.2f $tFresh%6.2f $tExec%6.2f  $verdict")
    }
    spark.stop()
  }
}
