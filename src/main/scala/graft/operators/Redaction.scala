package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction over text columns — the compliance pass a
  * training-data pipeline runs before anything leaves the raw zone.
  *
  * Capability extension beyond the reference (driver brief): the
  * reference handles patient-identifiable data by *dropping* identifier
  * columns before publication (`/root/reference/README.md:5` — the data
  * are private); this operator family generalizes that to in-content
  * identifiers.
  *
  * Everything is a pure Catalyst `regexp_replace`/`regexp_count`
  * expression chain: codegen'd, embarrassingly parallel, no UDFs — a
  * full-corpus redaction is one narrow map over the scan with zero
  * shuffles.
  *
  * Replacement order matters and is fixed: emails first (their local
  * part may contain digits a later pass would mangle), then IPs (dotted
  * digits the phone pattern must not see), then phone numbers.
  *
  * Known over-match, by design: the phone pattern is any 8+ run of
  * digits and dashes, which also matches ISO dates (`2024-01-01`) and
  * long invoice numbers. For PII purposes a false redaction is the safe
  * direction; date-bearing text should pre-mask dates or swap in a
  * stricter pattern — the operator takes the patterns as constants
  * precisely so deployments can re-tune them. */
object Redaction {

  // (?i): emails are case-insensitive by spec (and in the wild mixed
  // case is common — John.Doe@Example.COM must not escape a compliance
  // pass). The inline flag works in both Java regex (Spark) and RE2
  // (DuckDB), so the oracle SQL mirrors it verbatim.
  val emailPattern: String = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val ipPattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePattern: String = "\\+?\\d[\\d-]{6,}\\d"

  val emailToken = "[EMAIL]"
  val ipToken = "[IP]"
  val phoneToken = "[PHONE]"

  /** Replace emails, IPv4 addresses, and phone-like digit runs with
    * their redaction tokens. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailPattern, emailToken),
        ipPattern, ipToken),
      phonePattern, phoneToken)

  /** Occurrences of a literal redaction token (regex-escaped). */
  def tokenCount(c: Column, token: String): Column =
    size(regexp_extract_all(c, lit(token.replaceAll("([\\[\\]])", "\\\\$1")),
      lit(0)))

  /** Characters removed by redaction: `length(raw) − length(redacted)`.
    * Integer-exact, so it is a portable cross-engine audit measure. */
  def charsRemoved(raw: Column, redacted: Column): Column =
    length(raw) - length(redacted)

  /** 13–19-digit runs with optional single space/dash separators — the
    * payment-card surface form. RE2-portable (no lookaround), so the
    * oracle uses it verbatim. */
  val cardPattern: String = "\\b\\d(?:[ -]?\\d){12,18}\\b"
  val cardToken = "[CARD]"

  /** Luhn check over a candidate card string (separators tolerated):
    * from the rightmost digit, double every second one, subtract 9 when
    * doubling exceeds 9, and the total must divide by 10. A pure
    * sequential Catalyst fold — no UDF. */
  def luhnValid(cand: Column): Column = {
    val ds = filter(split(regexp_replace(cand, "[ -]", ""), ""), d => d =!= "")
    val n = size(ds)
    val total = aggregate(sequence(lit(1), n), lit(0L), (acc, i) => {
      val v = element_at(ds, n - i + 1).cast("long") // i-th from the right
      val dbl = when(i % 2 === 0, when(v * 2 > 9, v * 2 - 9).otherwise(v * 2))
        .otherwise(v)
      acc + dbl
    })
    n >= 13 && n <= 19 && total % 10 === 0
  }

  /** CHECKSUM-VALIDATED card redaction: only candidates that pass the
    * Luhn check are replaced with [[cardToken]] — the practical fix for
    * the naive digit-run rule, which also eats order ids, timestamps,
    * and EAN barcodes (a 16-digit run has a 1-in-10 chance of passing
    * Luhn, so validation removes ~90% of false redactions while a true
    * card number never escapes). Extraction, validation, and the
    * replacement fold are all per-row Catalyst expression chains —
    * same zero-shuffle contract as [[redactPii]]. */
  def redactCards(c: Column): Column = {
    val valid = filter(regexp_extract_all(c, lit(cardPattern), lit(0)),
      cand => luhnValid(cand))
    aggregate(valid, c, (acc, cand) => call_function("replace", acc, cand, lit(cardToken)))
  }
}
