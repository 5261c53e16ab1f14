package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection/redaction for training corpora (SURVEY §2 I7a): emails,
  * NANP-style phone numbers, and IPv4 literals — the standard pre-training
  * scrub pass. Pure codegen'd regexp expressions (no UDFs), so the scrub
  * runs at scan speed over 100 TB; the patterns deliberately stay inside
  * the regex subset Java (Spark) and RE2 (DuckDB/Trino-style engines)
  * agree on — character classes, bounded repetition, `\b` — so results are
  * engine-portable and oracle-checkable.
  */
object Privacy {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Redact in a fixed pass order: emails first (an email's local part can
    * contain digit runs a later pass would mangle), then phones, then IPs.
    * Replacement tokens contain no digits or `@`, so passes cannot create
    * new matches for each other. */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      Ipv4Re, "[IP]")

  /** Scrub projection: per-kind match counts + the redacted text. */
  def scrubDF(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      countMatches(col(textCol), EmailRe).as("n_emails"),
      countMatches(col(textCol), PhoneRe).as("n_phones"),
      countMatches(col(textCol), Ipv4Re).as("n_ips"),
      scrub(col(textCol)).as("redacted"))
}
