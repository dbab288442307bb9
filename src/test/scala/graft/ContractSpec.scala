package graft

/** Driver-contract guards: the driver pairs `SparkEntry.queries` with
  * `SparkEntry.oracleSql` by KEY and hash-compares result columns by
  * NAME — a typo in either map, or a duplicate column in a result
  * schema, fails silently driver-side (the oracle row just goes
  * missing or the hash mismatches). Catch both here instead. */
class ContractSpec extends SparkSpec {

  test("every oracleSql key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys with no query: $orphans")
  }

  test("every query analyzes at sf0.001 with unique, non-empty column names") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, SparkSpec.sf0001) // analysis (and any eager model build)
      val cols = df.columns.toSeq
      assert(cols.nonEmpty, s"$name has no columns")
      assert(cols.distinct.length == cols.length, s"$name duplicate columns: $cols")
      assert(cols.forall(_.trim.nonEmpty), s"$name blank column name: $cols")
    }
  }

  test("entry flagship returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
