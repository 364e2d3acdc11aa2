package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Mojibake-repair contract: classic UTF-8-as-cp1252 fixes, the
  * conservative no-touch gate, and the double-encoding two-pass path.
  * All non-ASCII is unicode-escaped so the fixtures can't themselves be
  * mangled by an editor; each mojibake literal is derived from the
  * UTF-8 bytes via a cp1252 decode with the five undefined bytes
  * (81 8D 8F 90 9D) kept as raw C1 chars \u2014 e.g. RIGHT SINGLE QUOTE
  * U+2019 = E2 80 99 displays as \u00e2 \u20ac \u2122. */
class EncodingRepairSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fix(s: String): String =
    Seq(s).toDF("text").select(EncodingRepair.fixMojibake(col("text")))
      .head().getString(0)
  private def flag(s: String): Boolean =
    Seq(s).toDF("text").select(EncodingRepair.isMojibake(col("text")))
      .head().getBoolean(0)

  test("repairs classic accent mojibake") {
    assert(fix("Caf\u00c3\u00a9") == "Caf\u00e9")
    // A0 displays as NBSP
    assert(fix("d\u00c3\u00a9j\u00c3\u00a0 vu") == "d\u00e9j\u00e0 vu")
    assert(fix("\u00c3\u00bcber na\u00c3\u00afve fa\u00c3\u00a7ade")
      == "\u00fcber na\u00efve fa\u00e7ade")
  }

  test("repairs cp1252-printable continuation bytes (smart quotes, dashes)") {
    // it<E2><80><99>s: 0x99 displays as the trademark sign
    assert(fix("it\u00e2\u20ac\u2122s") == "it\u2019s")
    // curly quotes: 0x9C = oe ligature; 0x9D is undefined in cp1252 and
    // survives as the raw C1 char
    assert(fix("\u00e2\u20ac\u0153hi\u00e2\u20ac\u009d")
      == "\u201chi\u201d")
    // en dash (0x93 displays as LEFT DOUBLE QUOTE) + ellipsis (0xA6 = broken bar)
    assert(fix("a \u00e2\u20ac\u201c b\u00e2\u20ac\u00a6")
      == "a \u2013 b\u2026")
  }

  test("gate: genuine text is untouched") {
    assert(fix("plain ascii text") == "plain ascii text")
    assert(!flag("plain ascii text"))
    // genuine Latin-1: e-acute alone is a continuation byte with no lead
    assert(fix("caf\u00e9 au lait") == "caf\u00e9 au lait")
    assert(!flag("caf\u00e9 au lait"))
    // genuine em dash (in the cp1252 printable set) amid ASCII:
    // translates to a bare continuation byte -> shape fails -> no-touch
    assert(fix("a \u2014 b") == "a \u2014 b")
    assert(!flag("a \u2014 b"))
    // codepoints > U+00FF outside the cp1252 set can never be bytes
    assert(fix("\u7684\u662f\u4e0d") == "\u7684\u662f\u4e0d")
    assert(!flag("\u7684\u662f\u4e0d"))
    // truncated sequence: lead byte with no continuation
    assert(fix("bad tail \u00c3") == "bad tail \u00c3")
    assert(!flag("bad tail \u00c3"))
    // overlong / surrogate shapes are rejected, not "repaired":
    // C0 80 would be overlong NUL; ED A0 80 a UTF-16 surrogate
    assert(fix("x\u00c0\u0080y") == "x\u00c0\u0080y")
    assert(fix("x\u00ed\u00a0\u0080y") == "x\u00ed\u00a0\u0080y")
  }

  test("double-encoded text repairs one layer per pass") {
    // e-acute through two bad decodes: C3 83 C2 A9 seen via cp1252
    // (0x83 = florin sign U+0192)
    val twice = "\u00c3\u0192\u00c2\u00a9"
    val once = fix(twice)
    assert(once == "\u00c3\u00a9") // one layer peeled
    assert(fix(once) == "\u00e9")  // second pass completes
  }

  test("long pathological inputs stay linear and correct") {
    // 50k repaired sequences in one row: the disjoint-first-char
    // alternation must scan once, not backtrack
    val big = "Caf\u00c3\u00a9 " * 50000
    val t0 = System.nanoTime()
    assert(fix(big.trim) == ("Caf\u00e9 " * 50000).trim)
    // 50k bare continuation bytes (cp1252 euro -> 0x80): first
    // alternative check fails immediately at char 0
    assert(fix("\u20ac" * 50000) == "\u20ac" * 50000)
    val elapsedS = (System.nanoTime() - t0) / 1e9
    assert(elapsedS < 30.0, f"regex path took $elapsedS%.1f s on 300k chars")
  }

  test("lone cp1252-undefined C1 chars are untouched") {
    // 0x81 / 0x9D alone are continuation bytes with no lead
    assert(fix("x\u0081y") == "x\u0081y")
    assert(!flag("x\u009dy"))
  }

  test("isMojibake agrees with fix-would-change") {
    for (s <- Seq("Caf\u00c3\u00a9", "it\u00e2\u20ac\u2122s",
                  "plain", "caf\u00e9", "a \u2014 b", "\u7684",
                  "bad tail \u00c3", "x\u00c0\u0080y"))
      assert(flag(s) == (fix(s) != s), s"disagree on: $s")
  }
}
