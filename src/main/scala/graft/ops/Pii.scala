package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: emails,
  * North-American phone numbers, IPv4 addresses, SSN-shaped ids.
  *
  * Patterns are deliberately RE2-safe (no lookaround, no backrefs) so
  * the same strings run under java.util.regex (Spark codegen) and
  * RE2-family engines (the gate's DuckDB oracle among them) with
  * identical matches. Detection and redaction are pure per-row
  * `regexp_*` expressions: whole-stage codegen, no shuffle, linear
  * scale-out — redacting 100 TB is exactly one pass over the scan.
  */
object Pii {

  /** user@host.tld — conservative: alphanumeric + common specials. */
  val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** 123-45-6789 (US SSN shape). Checked before Phone so the 3-2-4
    * grouping is never half-consumed as a phone prefix. */
  val Ssn = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** 555-123-4567 / 555.123.4567 / +555 123 4567. */
  val Phone = "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  /** Dotted-quad IPv4 (no range check — detection, not validation). */
  val Ipv4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** (pattern, replacement token) in application order: email first
    * (its local part may contain digits/dots that the later numeric
    * patterns would nibble), then SSN before the looser Phone. */
  val Rules: Seq[(String, String)] = Seq(
    Email -> "[EMAIL]", Ssn -> "[SSN]", Phone -> "[PHONE]", Ipv4 -> "[IP]")

  /** Adds per-doc match counts for each PII class (detection pass);
    * passthrough-style like [[TextAnalysis.qualityMetrics]]. */
  def piiCounts(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_email", size(regexp_extract_all(t, lit(Email), lit(0))))
      .withColumn("n_ssn", size(regexp_extract_all(t, lit(Ssn), lit(0))))
      .withColumn("n_phone", size(regexp_extract_all(t, lit(Phone), lit(0))))
      .withColumn("n_ipv4", size(regexp_extract_all(t, lit(Ipv4), lit(0))))
  }

  /** Replace every PII match with its class token, in [[Rules]] order. */
  def redact(text: Column): Column =
    Rules.foldLeft(text) { case (c, (pat, tok)) => regexp_replace(c, pat, tok) }
}
