package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale read-out for [[graft.ext.Annotations.bradleyTerry]] (round 12):
  * the driver fixture is a 20-item arena, but arena-style preference
  * aggregation at platform scale is thousands of policies × millions of
  * comparisons. This probe synthesizes a deterministic league (items
  * win in proportion to a planted strength) and measures where the cost
  * lives: the ONE corpus-touching pair/win aggregate up front vs the
  * per-MM-round model-sized work (two keyed joins + one keyed aggregate
  * over the |items|²-bounded directed-pair frame, NOT the corpus).
  *
  * Expected shape (and what round-12 measured — see ARCHITECTURE.md):
  * fit cost is dominated by the first aggregate; extra MM rounds are
  * near-free because they never re-touch the comparison corpus. A sanity
  * gate asserts the fit RECOVERS the planted order (top-θ items come
  * from the strongest planted decile). */
object ProbeBt {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val items = 1000
    val games = 2000000L
    // deterministic league: strength s(i) = i+1; game g pairs (i, j) by
    // hash striping and awards the win by a hash draw proportional to
    // s(i)/(s(i)+s(j)) — the BT generative model itself, derandomized
    val base = spark.range(games)
      .withColumn("h1", abs(xxhash64(col("id"))))
      .withColumn("h2", abs(xxhash64(col("id") + lit(games))))
      .withColumn("i", (col("h1") % items).cast("int"))
      .withColumn("j",
        ((col("i") + lit(1) + col("h2") % lit(items - 1)) % items).cast("int"))
      .withColumn("draw", (abs(xxhash64(col("id") * 31)) % (col("i") + col("j") + lit(2))))
      .select(col("i").as("a"), col("j").as("b"),
        when(col("draw") < col("i") + lit(1), col("i")).otherwise(col("j")).as("winner"))
      .selectExpr("cast(a as string) a", "cast(b as string) b",
        "cast(winner as string) winner")

    def sec(run: => Unit): Double = {
      val t0 = System.nanoTime(); run; (System.nanoTime() - t0) / 1e9
    }

    base.write.mode("overwrite").parquet("/tmp/probe_bt_games")
    val comps = spark.read.parquet("/tmp/probe_bt_games")
    println(f"[bt] corpus: ${comps.count()} games over $items items")

    Seq(1, 2, 4).foreach { rounds =>
      val t = sec {
        ext.Annotations.bradleyTerry(comps, rounds = rounds)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"[bt] rounds=$rounds fit_s=$t%.2f")
    }

    // recovery sanity: with strength ∝ index, the top-20 thetas should
    // come from the strongest planted decile (index >= 900)
    val top = ext.Annotations.bradleyTerry(comps, rounds = 4)
      .limit(20).collect().map(_.getAs[String]("item").toInt)
    val recovered = top.count(_ >= items - 100)
    println(s"[bt] top-20 by theta from the planted top decile: $recovered/20")
    require(recovered >= 18, s"planted-order recovery failed: $recovered/20")
    spark.stop()
  }
}
