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

  /** IPv6 surface forms: the full 8-group form plus `::`-compressed
    * variants. RE2-portable (no lookaround); like [[phonePattern]] it
    * deliberately over-matches odd colon runs — the safe direction for
    * redaction — and deployments swap a stricter pattern in the same
    * slot. Redact BEFORE IPv4 so an IPv4-mapped tail (`::ffff:1.2.3.4`)
    * never leaks a partial dotted quad past this pass. */
  val ipv6Pattern: String =
    "(?i)\\b(?:[0-9a-f]{1,4}:){7}[0-9a-f]{1,4}\\b|" +
      "(?i)(?:[0-9a-f]{1,4}:){1,7}:(?:[0-9a-f]{1,4}(?::[0-9a-f]{1,4}){0,6})?|" +
      "(?i)::(?:[0-9a-f]{1,4}(?::[0-9a-f]{1,4}){0,7})"
  val ipv6Token = "[IPV6]"

  /** Replace IPv6 addresses with [[ipv6Token]]. */
  def redactIpv6(c: Column): Column =
    regexp_replace(c, ipv6Pattern, ipv6Token)

  /** IBAN surface form: 2-letter country, 2 check digits, then EITHER a
    * compact 11–30-alphanumeric run OR the grouped-by-4 print form
    * (space-separated 4-char groups, short last group allowed). The two
    * alternatives are deliberate: a naive `(?: ?[A-Z0-9])+` body is
    * greedy across single spaces and absorbs a trailing uppercase token
    * (`… 0130 00 SWIFT`), making the checksum fail on the extended
    * candidate so the TRUE IBAN inside it escapes — the exact leak this
    * validator exists to prevent. Irregularly spaced IBANs (`DE89
    * 37040044 …`) do not extract; that misses redaction only for
    * non-standard spacing, the safe direction vs swallowing neighbors.
    * Shape only — [[ibanValid]] does the arithmetic. */
  val ibanPattern: String =
    "\\b[A-Z]{2}\\d{2}(?:[A-Z0-9]{11,30}|(?: [A-Z0-9]{4}){2,7}(?: [A-Z0-9]{1,3})?)\\b"
  val ibanToken = "[IBAN]"

  /** ISO 13616 mod-97 IBAN check: move the first four characters to the
    * end, map letters A→10 … Z→35, and the resulting number must be
    * ≡ 1 (mod 97). Computed as an incremental sequential fold over the
    * characters (`acc·10+d` per digit, `acc·100+v` per letter, mod 97
    * each step — no big-integer needed), the same pure-Catalyst
    * pattern as [[luhnValid]]. */
  def ibanValid(cand: Column): Column = {
    val up = upper(regexp_replace(cand, " ", ""))
    val rearranged = concat(substring(up, 5, 34), substring(up, 1, 4))
    val cs = filter(split(rearranged, ""), ch => ch =!= "")
    val total = aggregate(cs, lit(0L), (acc, ch) => {
      val a = ascii(ch)
      when(a >= 48 && a <= 57, (acc * 10 + (a - 48)) % 97)
        .otherwise((acc * 100 + (a - 55)) % 97)
    })
    length(up) >= 15 && length(up) <= 34 && total === 1
  }

  /** CHECKSUM-VALIDATED IBAN redaction — [[redactCards]]'s shape with
    * the mod-97 validator: shape matches that fail the check (invoice
    * codes, reference numbers that happen to look like `XX99…`) are
    * left alone; a true IBAN never escapes. Pure per-row expression
    * chain, zero shuffles. */
  def redactIbans(c: Column): Column = {
    val valid = filter(regexp_extract_all(c, lit(ibanPattern), lit(0)),
      cand => ibanValid(cand))
    aggregate(valid, c, (acc, cand) => call_function("replace", acc, cand, lit(ibanToken)))
  }
}
