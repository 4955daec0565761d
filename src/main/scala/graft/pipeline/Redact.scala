package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for a training corpus: find and replace e-mail
  * addresses, phone-shaped numbers, and IPv4 literals with typed
  * placeholder tokens, and count what was removed — the redaction pass
  * every large-scale text pipeline runs before packing sequences.
  *
  * Pure narrow projections (`regexp_replace` / `regexp_extract_all`
  * compile once per task and stream through whole-stage codegen), so the
  * pass is embarrassingly parallel at any scale — no shuffle, no UDF.
  * The patterns deliberately use the regex subset with identical
  * semantics in Java's engine and RE2 (character classes, bounded
  * repetition, `\b`), so the driver's DuckDB oracle can run the very
  * same expressions.
  */
object Redact {

  /** Conservative e-mail shape: local part, @, dotted domain, TLD ≥ 2. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style phone fragments: optional area code in
    * parentheses or dash/space-separated triples, e.g. 555-0199,
    * 555-867-5309, (415) 555-0199. Digit runs anchor on word
    * boundaries; the boundary sits INSIDE the optional groups because
    * `\b` before `(` never matches (paren is not a word char). */
  val phoneRe = "(\\(\\d{3}\\)[ -]?|\\b\\d{3}[ -])?\\b\\d{3}[ -]\\d{4}\\b"

  /** Dotted-quad IPv4 literal (no range check — redaction errs loud). */
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Number of matches of `re` in `text` (0 for no match). */
  def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** `text` with every match of `re` replaced by `token`. */
  def redact(text: Column, re: String, token: String): Column =
    regexp_replace(text, re, token)

  /** Full scrub: e-mails, then phones, then IPv4s, each to its own
    * placeholder. Order matters only in that an e-mail's digits must not
    * be half-eaten by the phone pass — hence e-mails first. */
  def scrub(text: Column): Column =
    redact(redact(redact(text, emailRe, "<EMAIL>"),
      phoneRe, "<PHONE>"), ipv4Re, "<IP>")
}
