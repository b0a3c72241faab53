package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** PII detection / redaction over free-text columns — the
  * scrub-before-training pass every production corpus runs (emails,
  * IP addresses, long digit runs standing in for phone/account
  * numbers).
  *
  * Pattern catalog discipline: every regex here is deliberately
  * restricted to the syntax subset with identical semantics in
  * java.util.regex (Spark codegen) and RE2 (DuckDB oracle): character
  * classes, bounded repetition, word boundaries, leftmost
  * non-overlapping scan. No backreferences, no lookaround — those
  * diverge across engines AND catastrophically backtrack at corpus
  * scale; a 100 TB scan wants patterns with linear-time guarantees.
  *
  * Scale shape: counts and redaction are NARROW per-row expressions —
  * no shuffle at all, the scan runs at parquet-read speed inside
  * whole-stage codegen and the summary aggregate is the only
  * exchange. Redaction replaces in severity order (email → IPv4 →
  * digit run) so the digit-run rule sees the text with structured
  * matches already collapsed; counts are taken at the SAME stage of
  * that cascade they redact in, so n_digit never double-counts an
  * IP's octets.
  */
object Pii {

  /** user@host.tld — ASCII mailbox shapes (the corpus-scrub pattern,
    * not an RFC validator).
    */
  val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  /** dotted-quad IPv4 (octet ranges unchecked — scrub recall beats
    * precision).
    */
  val ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** runs of ≥2 digits: ids, phone fragments, account numbers. */
  val digitRunRe = "[0-9]{2,}"

  private def countMatches(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast(LongType)

  /** Per-row PII scan of `textCol`: match counts per pattern class, a
    * severity-ordered redacted form, and the redacted text's md5 (the
    * hash keeps the verdict oracle-comparable without shipping the
    * full redacted string through the compare).
    *
    * Output: (idCol, n_email, n_ipv4, n_digit, redacted_md5).
    */
  def piiScan(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, emailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, ipv4Re, "<IP>")
    val t3 = regexp_replace(t2, digitRunRe, "<NUM>")
    df.select(col(idCol),
      countMatches(t0, emailRe).as("n_email"),
      countMatches(t1, ipv4Re).as("n_ipv4"),
      countMatches(t2, digitRunRe).as("n_digit"),
      md5(t3).as("redacted_md5"))
  }

  /** Corpus-level PII telemetry: per group, how many rows carry each
    * pattern class and the total match volume — the dashboard number
    * a scrub pipeline alerts on. One narrow scan + one hash
    * aggregate.
    */
  def piiSummary(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val scanned = df.select(col(groupCol),
      countMatches(col(textCol), emailRe).as("e"),
      countMatches(regexp_replace(col(textCol), emailRe, "<EMAIL>"), ipv4Re).as("i"),
      countMatches(
        regexp_replace(regexp_replace(col(textCol), emailRe, "<EMAIL>"), ipv4Re, "<IP>"),
        digitRunRe).as("d"))
    scanned.groupBy(groupCol)
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("e") > 0, 1L).otherwise(0L)).as("rows_email"),
        sum(when(col("i") > 0, 1L).otherwise(0L)).as("rows_ipv4"),
        sum(when(col("d") > 0, 1L).otherwise(0L)).as("rows_digit"),
        sum(col("e") + col("i") + col("d")).as("n_matches"))
  }
}
