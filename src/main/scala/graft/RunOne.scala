package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump ONE SparkEntry query (+ its oracle SQL) in the same
  * layout as [[Verify]], so `scripts/check_oracle.py` can gate a single
  * query without the full 90-query sweep:
  * {{{
  *   sbt "runMain graft.RunOne q_cms_topk_docs /root/testdata/sf0.01 /tmp/one"
  *   python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/one
  * }}} */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/$name")
    import java.nio.file.{Files, Paths}
    def q(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      s"{${q(name)}: ${q(SparkEntry.oracleSql(name))}}")
    spark.stop()
  }
}
