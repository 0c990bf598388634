package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation: scan text for
  * email addresses, NANP-style phone numbers, and IPv4 addresses; count
  * them for audit reports and scrub them behind typed placeholders before
  * export.
  *
  * All pure built-in regexp compositions (no UDFs): per-row, codegen'd,
  * no shuffle — the scrub rides the scan at 100 TB. The patterns use only
  * constructs shared by Java regex and RE2 (no lookaround, no
  * backreferences), so the identical pattern text runs on Spark and on
  * RE2-based engines (the DuckDB oracle uses these same strings).
  */
object PiiFunctions {

  /** RFC-5322-ish practical email shape (the full grammar is not regular;
    * this is the standard scrubbing approximation). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style phone: 3-3-4 digit groups with `-` or `.` separators.
    * Word-bounded so longer digit runs don't partially match. */
  val PhonePattern = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"

  /** Dotted-quad IPv4 (octet range not enforced — scrubbing favors recall;
    * four 1-3 digit groups). Word-bounded. */
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  private def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  def emailCount(text: Column): Column = countMatches(text, EmailPattern)
  def phoneCount(text: Column): Column = countMatches(text, PhonePattern)
  def ipv4Count(text: Column): Column = countMatches(text, Ipv4Pattern)

  /** Redact all three PII classes behind typed placeholders. Order
    * matters and is part of the contract: emails first (their local parts
    * can contain digit runs), then phones, then IPv4 (a dotted phone
    * never forms four dotted groups, so phone-before-ip is safe). */
  def redact(text: Column): Column = {
    val e = regexp_replace(text, EmailPattern, "<EMAIL>")
    val p = regexp_replace(e, PhonePattern, "<PHONE>")
    regexp_replace(p, Ipv4Pattern, "<IP>")
  }
}
