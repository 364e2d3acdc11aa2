package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PII detection and redaction for web-text corpora.
 *
 * Every public training-data pipeline (C4, RefinedWeb, Dolma, FineWeb)
 * runs a regex-level PII pass that replaces e-mail addresses, IP
 * addresses, and phone numbers with fixed placeholder tokens before the
 * text is kept — both a compliance step and a dedup aid (two pages
 * differing only in a rotating session IP become byte-identical after
 * redaction). The reference has no PII stage (library metadata carries
 * none); this operator exists for the web-text payload this engine
 * targets. Patterns follow the published Dolma/FineWeb regex tier:
 * recall-oriented, no checksum validation — a version string like
 * `1.2.3.4` is accepted as an IP by design, disclosed below.
 *
 * Contract (what the oracle rows hand-specify against):
 *  - e-mail: `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}` →
 *    `<EMAIL>`.
 *  - IPv4: four 1–3-digit groups joined by dots, word-bounded →
 *    `<IP>`. No octet range check (recall-oriented).
 *  - phone: 3–8 groups of 2–4 digits separated by single spaces or
 *    dashes, optionally preceded by `+CC` and/or a parenthesised area
 *    code → `<PHONE>`. Dots are deliberately NOT phone separators so
 *    IPv4s can never double-match. The 8-group cap (real numbering
 *    plans top out near 15 digits) is ALSO a safety bound: Java's
 *    regex engine recurses once per GROUP-quantifier iteration, so
 *    the previous unbounded `(...)+` tail threw StackOverflowError on
 *    a ~30k-group digit chain (reproduced; a long table of dash-joined
 *    numbers is ordinary webtext). A pathological chain now redacts as
 *    consecutive 8-group phones instead of crashing the task.
 *  - Order: e-mails, then IPs, then phones — each later pattern runs
 *    on the already-redacted text, so a digit-bearing e-mail local
 *    part or an IP can never additionally count/redact as a phone.
 *
 * Scale notes (100 TB design point): both entry points are single-pass
 * per-row `regexp_count`/`regexp_replace` builtins — codegen'd, no UDF,
 * no shuffle; redaction composes into the scan stage so the cleaned
 * text is born in the same task that read the page. The three patterns
 * are possessive-free and backtrack-bounded (character classes +
 * bounded quantifiers), so pathological inputs stay linear-ish.
 */
object PiiOps {

  val emailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re: String = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
  val phoneRe: String =
    "(\\+\\d{1,3}[ -])?(\\(\\d{2,4}\\)[ -]?|\\d{2,4}[ -])\\d{2,4}([ -]\\d{2,4}){1,6}"

  /** Text with e-mails, then IPv4s, then phones replaced by
    * `<EMAIL>`/`<IP>`/`<PHONE>` (ordered so digit-bearing e-mails and
    * IPs are consumed before the phone pass sees them). */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  /** Per-doc PII hit counts `(doc_id, n_emails, n_ips, n_phones)`.
    * Counts follow the same staged-redaction semantics as `redact`:
    * IPs are counted on e-mail-redacted text, phones on
    * e-mail+IP-redacted text. */
  def piiStats(docs: DataFrame, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    val noEmail = regexp_replace(col(textCol), emailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, ipv4Re, "<IP>")
    docs.select(col(idCol),
      regexp_count(col(textCol), lit(emailRe)).cast("long").as("n_emails"),
      regexp_count(noEmail, lit(ipv4Re)).cast("long").as("n_ips"),
      regexp_count(noIp, lit(phoneRe)).cast("long").as("n_phones"))
  }

  /** Redacted corpus: `(doc_id, redacted)`. */
  def redactDocs(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), redact(col(textCol)).as("redacted"))
}
