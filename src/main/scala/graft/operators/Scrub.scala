package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: replace emails, IPv4 addresses,
  * and phone-shaped digit runs with stable placeholder tokens (the
  * standard pre-training redaction pass), plus a counting form for
  * corpus audits.
  *
  * Everything is codegen'd `regexp_replace`/`regexp_count` — stateless
  * row-at-a-time, valid in batch and streaming plans alike, zero
  * shuffles. Patterns stay within the RE2-compatible subset (no
  * backreferences, no lookaround) so an external engine (the DuckDB
  * oracle, or a downstream validator) can reproduce the exact rewrite.
  */
object Scrub {

  /** (pattern, replacement) rules, applied in order. Order matters:
    * emails go first so their user/host digits can't be half-eaten by
    * the phone rule; IPv4 before phone so dotted quads don't match the
    * phone shape. */
  val PiiRules: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b(\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
    ("(\\+?\\d{1,3}[-. ]?)?\\(?\\d{3}\\)?[-. ]?\\d{3}[-. ]?\\d{4}\\b", "<PHONE>"))

  /** The scrubbed text column: all rules applied, all occurrences. */
  def scrubbed(text: Column): Column =
    PiiRules.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** Per-rule occurrence counts (pre-scrub), for corpus audits. */
  def piiCounts(text: Column): Column =
    struct(
      regexp_count(text, lit(PiiRules(0)._1)).as("n_emails"),
      regexp_count(text, lit(PiiRules(1)._1)).as("n_ips"),
      regexp_count(text, lit(PiiRules(2)._1)).as("n_phones"))

  /** Replaces `textCol` with its scrubbed form and appends the audit
    * counts. */
  def scrubPii(df: DataFrame, textCol: String): DataFrame =
    // kernel floor (Par.widen, streaming-safe no-op): three regexp
    // families over the full text ride the scan stage
    Par.widen(df).withColumn("__pii", piiCounts(col(textCol)))
      .withColumn(textCol, scrubbed(col(textCol)))
      .withColumn("n_emails", col("__pii.n_emails"))
      .withColumn("n_ips", col("__pii.n_ips"))
      .withColumn("n_phones", col("__pii.n_phones"))
      .drop("__pii")
}
