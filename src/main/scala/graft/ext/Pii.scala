package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based PII scrubbing for training corpora (the public recipe used
  * by BigCode/StarCoder's PII pipeline and FineWeb's anonymization step:
  * regex detectors for structured identifiers, replaced with typed
  * placeholder tokens so downstream models never memorize them).
  *
  * Everything is `regexp_count`/`regexp_replace` — codegen'd built-ins,
  * no UDFs, so the whole pass is one map-side projection over the corpus:
  * zero shuffles, trivially 100 TB-safe, and exactly replayable by any
  * RE2/PCRE engine. The default rules deliberately use only regex
  * constructs with IDENTICAL semantics in Java regex (Spark) and RE2
  * (DuckDB, the oracle): character classes, bounded/greedy quantifiers,
  * non-capturing groups, ASCII `\b` — no lookaround, no backreferences
  * (RE2 has neither).
  *
  * Relationship to [[TextStats.redactPii]]: that is the fixed
  * column-level form (email/URL/IP, no bookkeeping) for inline use in
  * larger expressions; this object is the frame-level audit form —
  * configurable rule sets, per-rule replacement counts for corpus PII
  * prevalence reports, and validation that fails bad rules on the
  * driver instead of mid-job.
  *
  * Rules apply IN ORDER and each counts its matches on the text as
  * already redacted by the previous rules — i.e. `n_<rule>` is the
  * number of replacements that rule actually performed, and a substring
  * consumed by an earlier rule (digits inside an email) is never double
  * counted by a later one. Placeholders contain no digits or `@`, so a
  * replacement can never create a fresh match for a later rule.
  */
object Pii {

  /** One detector: `name` labels the count column (`n_<name>`),
    * `pattern` must be RE2-compatible (see object doc), `replacement`
    * must be literal (no `$`/`\` group references). */
  final case class Rule(name: String, pattern: String, replacement: String)

  /** Email, IPv4, and international-prefix phone detectors. Precision
    * over recall (the BigCode trade): each anchors on a structural token
    * (`@`, dotted quads, `+cc`) rather than bare digit runs, so prose and
    * numeric columns pass through untouched. */
  val defaultRules: Seq[Rule] = Seq(
    Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    Rule("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    Rule("phone", "\\+\\d{1,3}[- ]\\d{3}[- ]\\d{4}", "<PHONE>"))

  private def validate(rules: Seq[Rule]): Unit = {
    require(rules.nonEmpty, "need at least one rule")
    val names = rules.map(_.name)
    require(names.distinct.length == names.length, s"duplicate rule names: $names")
    rules.foreach { r =>
      require(!r.replacement.exists(c => c == '$' || c == '\\'),
        s"rule '${r.name}': replacement must be literal (no $$/\\)")
      java.util.regex.Pattern.compile(r.pattern) // fail fast on the driver
    }
  }

  /** Redact `textCol` in place and append one `n_<rule>` count per rule
    * (LONG, matches actually replaced — see object doc for the
    * sequential-count semantics). All other columns pass through. */
  def redactPii(
      docs: DataFrame,
      textCol: String = "text",
      rules: Seq[Rule] = defaultRules): DataFrame = {
    validate(rules)
    val start: (Column, Seq[(String, Column)]) = (col(textCol), Nil)
    val (redacted, counts) = rules.foldLeft(start) { case ((txt, acc), r) =>
      // count on the PREVIOUS stage's text, then replace on it: Catalyst
      // collapses the fold into one projection; each stage's text is a
      // linear chain (no subtree fan-out — the PlanLint class of trap
      // needs the SAME expensive subtree duplicated, here each regexp
      // input appears once in the count and once in the replace, both
      // cheap relative to the scan)
      (regexp_replace(txt, r.pattern, r.replacement),
        acc :+ (s"n_${r.name}", regexp_count(txt, lit(r.pattern)).cast("long")))
    }
    val withCounts = counts.foldLeft(docs) { case (d, (name, c)) => d.withColumn(name, c) }
    withCounts.withColumn(textCol, redacted)
  }

  /** Count-only form (no rewrite): per-rule match counts over the raw
    * text, for corpus-level PII prevalence audits. NOTE: unlike
    * [[redactPii]]'s sequential counts, these are INDEPENDENT counts on
    * the same raw text (a digit run inside an email may count for both
    * rules). */
  def piiStats(
      docs: DataFrame,
      textCol: String = "text",
      rules: Seq[Rule] = defaultRules): DataFrame = {
    validate(rules)
    rules.foldLeft(docs) { (d, r) =>
      d.withColumn(s"n_${r.name}", regexp_count(col(textCol), lit(r.pattern)).cast("long"))
    }
  }
}
