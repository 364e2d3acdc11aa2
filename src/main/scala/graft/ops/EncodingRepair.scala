package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mojibake (double-encoding) repair for web-text corpora.
  *
  * The dominant real-world corruption in crawled text is UTF-8 bytes
  * that were decoded as Windows-1252/Latin-1 somewhere upstream:
  * "Café" ships as "CafÁ-lookalike digraphs", curly quotes
  * as three-character runs. Public cleaning pipelines run an
  * ftfy-style pass for this (Speer, ftfy — public tool; the method,
  * NOT the code, is reproduced here in original Spark form). This
  * operator implements ftfy's core transform — re-encode the text
  * through the codepage it was wrongly decoded with, then decode the
  * bytes as UTF-8 — entirely with codegen builtins, no UDF:
  *
  *   1. `translate` maps the 27 Windows-1252 printables at 0x80–0x9F
  *      back to the C1 codepoints their bytes sit at, turning "seen
  *      through cp1252" into "seen through ISO-8859-1" (which Spark's
  *      encode/decode charset whitelist supports; cp1252 itself is not
  *      on it).
  *   2. A structural gate: the text repairs ONLY if every char is
  *      <= U+00FF (so the Latin-1 encode is total — `encode` would
  *      raise under Spark 4's default REPORT coding-error action),
  *      at least one multi-byte UTF-8 lead is present, and the
  *      re-encoded bytes pass the engine-native `is_valid_utf8`
  *      (full RFC 3629: overlongs, surrogates, C0/C1 leads, F5+ all
  *      rejected). Genuine Latin-1/ASCII text ("café", "a — b") and
  *      anything with codepoints > U+00FF fail the gate and pass
  *      through untouched — the same conservatism ftfy gets from
  *      attempting the roundtrip and keeping it only when it decodes.
  *   3. the repaired value is `cast(encode(translated, ISO-8859-1) as
  *      string)` — a zero-copy reinterpretation of the original bytes
  *      as UTF-8, already proven valid by the gate.
  *
  * Scale notes: per-row, shuffle-free, whole-stage-codegen column
  * expressions — composes into the scan stage like PiiOps. One pass
  * repairs one mojibake layer; doubly-corrupted text (rare) is fixed by
  * applying the column twice — the gate no-ops the second application
  * on singly-corrupted rows. */
object EncodingRepair {

  /** Windows-1252 printable characters at bytes 0x80–0x9F, in byte
    * order (0x81, 0x8D, 0x8F, 0x90, 0x9D are undefined in cp1252 and
    * usually survive as raw C1 controls, which need no mapping):
    * euro, low quotes, florin, ellipsis, daggers, circumflex, permille,
    * S/Z-caron, guillemets, OE/oe, curly quotes, bullet, dashes, tilde,
    * trademark, Y-diaeresis. */
  val cp1252Printables: String =
    "\u20ac\u201a\u0192\u201e\u2026\u2020\u2021\u02c6\u2030\u0160" +
    "\u2039\u0152\u017d\u2018\u2019\u201c\u201d\u2022\u2013\u2014" +
    "\u02dc\u2122\u0161\u203a\u0153\u017e\u0178"

  /** The C1 codepoints those characters' cp1252 bytes sit at (same
    * order as [[cp1252Printables]]). */
  val c1Controls: String =
    "\u0080\u0082\u0083\u0084\u0085\u0086\u0087\u0088\u0089\u008a" +
    "\u008b\u008c\u008e\u0091\u0092\u0093\u0094\u0095\u0096\u0097" +
    "\u0098\u0099\u009a\u009b\u009c\u009e\u009f"

  /** Every char must be <= U+00FF so the Latin-1 encode is total
    * (single-char-class loop: Java compiles this to an ITERATIVE Curly
    * node — a structured per-sequence alternation regex here recursed
    * once per repetition and threw StackOverflowError at ~50k
    * sequences, caught by the long-input spec). */
  private val latin1Re: String = "^[\\x00-\\xff]*$"

  /** At least one multi-byte UTF-8 lead byte present (else the
    * roundtrip is the identity and the row should not be touched). */
  private val leadRe: String = "[\\xc2-\\xf4]"

  private def latin1View(text: Column): Column =
    translate(text, cp1252Printables, c1Controls)

  /** The wrongly-decoded text's original bytes, reinterpreted as UTF-8:
    * encode is total under the latin1Re guard, and cast(binary as
    * string) wraps the bytes without validation — validity is decided
    * by the engine-native is_valid_utf8 (full RFC 3629: overlongs,
    * surrogates, C0/C1 leads, F5+ all rejected), which scans linearly
    * where a structured validation regex overflowed the stack on long
    * rows. */
  private def reinterp(t: Column): Column =
    encode(t, "ISO-8859-1").cast("string")

  private def gate(t: Column): Column =
    t.rlike(latin1Re) && t.rlike(leadRe) && is_valid_utf8(reinterp(t))

  /** True where the text is repairable mojibake (repair would change
    * it: the gate requires a multi-byte sequence, which always
    * collapses). */
  def isMojibake(text: Column): Column = gate(latin1View(text))

  /** The text with one layer of UTF-8-as-cp1252/Latin-1 mojibake
    * repaired; non-mojibake text (including genuine Latin-1 and any
    * text with codepoints > U+00FF) is returned unchanged. */
  def fixMojibake(text: Column): Column = {
    val t = latin1View(text)
    when(gate(t), reinterp(t)).otherwise(text)
  }
}
