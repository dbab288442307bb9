package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation toolkit for the 100 TB join paths.
  *
  * Spark's AQE rewrites skewed SORT-MERGE joins automatically
  * (`spark.sql.adaptive.skewJoin.*`), but only when the skew is visible
  * in the shuffle statistics of a completed stage and only for the join
  * patterns it recognizes. `saltedJoin` is the deterministic pre-salting
  * form for the cases AQE does not cover: extreme single-key skew known
  * in advance (a null-ish default key, a celebrity entity), broadcast-
  * ineligible build sides, or AQE disabled.
  */
object Skew {

  /** Equi-join `left` (large, skewed on `key`) with `right` (smaller)
    * after splitting every hot key across `saltFactor` sub-keys: each
    * left row gets a deterministic content-derived salt in
    * [0, saltFactor), the right side is replicated across ALL salts, and
    * the join runs on (key, salt) — so one hot key's rows land in
    * `saltFactor` shuffle partitions instead of one. Inner-join semantics
    * are identical to `left.join(right, key)` (each left row matches
    * exactly its salt's replica); the cost is a `saltFactor`× blow-up of
    * the RIGHT side's shuffle volume, which is the correct trade exactly
    * when |right| ≪ |left|'s hot keys.
    *
    * The salt is `xxhash64` of the whole left row (mod saltFactor):
    * deterministic under task retries (unlike monotonically_increasing_id
    * or rand), and it spreads identical-key rows uniformly. Exact
    * duplicate rows share a salt — harmless for correctness, and a corpus
    * of EXACT duplicate rows is a dedup problem, not a join-skew one. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int = 16): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    require(left.columns.contains(key) && right.columns.contains(key),
      s"join key '$key' must exist on both sides")
    val salt = pmod(xxhash64(struct(left.columns.map(col).toSeq: _*)),
      lit(saltFactor.toLong))
    val l = left.withColumn("__salt", salt)
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
