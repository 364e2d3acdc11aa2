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
  *   2. A structural gate: the text repairs ONLY if, read as Latin-1
  *      bytes, it forms well-formed UTF-8 (full RFC 3629 shape —
  *      overlongs and surrogates excluded) AND contains at least one
  *      multi-byte lead. Genuine Latin-1/ASCII text ("café", "a — b")
  *      and anything with codepoints > U+00FF fail the gate and pass
  *      through untouched — the same conservatism ftfy gets from
  *      attempting the roundtrip and keeping it only when it decodes.
  *      The gate also makes step 3 total: `encode` never sees an
  *      unmappable char, `decode` never sees malformed bytes (both
  *      would raise under Spark 4's default REPORT coding-error
  *      action).
  *   3. `decode(encode(translated, ISO-8859-1), UTF-8)`.
  *
  * The shape regex's alternatives have pairwise-disjoint first
  * characters (00–7F | C2–DF | E0 | E1–EC,EE,EF | ED | F0 | F1–F3 |
  * F4), so the anchored scan is backtracking-free in practice; a bare
  * continuation byte fails every alternative immediately.
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

  /** Well-formed UTF-8, RFC 3629, expressed over chars 0x00–0xFF
    * standing for bytes. Anything containing a char > U+00FF matches
    * no alternative and fails. */
  val utf8ShapeRe: String =
    "^(?:[\\x00-\\x7f]" +
      "|[\\xc2-\\xdf][\\x80-\\xbf]" +
      "|\\xe0[\\xa0-\\xbf][\\x80-\\xbf]" +
      "|[\\xe1-\\xec\\xee\\xef][\\x80-\\xbf]{2}" +
      "|\\xed[\\x80-\\x9f][\\x80-\\xbf]" +
      "|\\xf0[\\x90-\\xbf][\\x80-\\xbf]{2}" +
      "|[\\xf1-\\xf3][\\x80-\\xbf]{3}" +
      "|\\xf4[\\x80-\\x8f][\\x80-\\xbf]{2})*$"

  private val leadRe: String = "[\\xc2-\\xf4]"

  private def latin1View(text: Column): Column =
    translate(text, cp1252Printables, c1Controls)

  /** True where the text is repairable mojibake (repair would change
    * it). */
  def isMojibake(text: Column): Column = {
    val t = latin1View(text)
    t.rlike(leadRe) && t.rlike(utf8ShapeRe)
  }

  /** The text with one layer of UTF-8-as-cp1252/Latin-1 mojibake
    * repaired; non-mojibake text (including genuine Latin-1 and any
    * text with codepoints > U+00FF) is returned unchanged. */
  def fixMojibake(text: Column): Column = {
    val t = latin1View(text)
    when(t.rlike(leadRe) && t.rlike(utf8ShapeRe),
      decode(encode(t, "ISO-8859-1"), "UTF-8"))
      .otherwise(text)
  }
}
