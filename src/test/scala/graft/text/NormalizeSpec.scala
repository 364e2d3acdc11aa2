package graft.text

import org.scalatest.funsuite.AnyFunSuite

/**
 * Golden byte-level fixtures for the reference normalization contract
 * (classes/MetadataUtils.php:141-153 and friends) — FIXTURES.md §3.
 * Expected values hand-derived from the PHP semantics, covering the fold
 * map, the ä/å/ö exemptions, the Latin-1 survivor bytes, and the
 * asymmetric Levenshtein denominators.
 */
class NormalizeSpec extends AnyFunSuite {
  import Normalize._

  test("normalize: ASCII words lose spaces and punctuation, keep case-folded alnum") {
    assert(normalize("Hello, World! 123") == "helloworld123")
    assert(normalize("the fast key order") == "thefastkeyorder")
    assert(normalize("") == "")
  }

  test("normalize: survivor bytes [ \\ ] ^ _ ` pass through") {
    assert(normalize("a[b\\c]d^e_f`g") == "a[b\\c]d^e_f`g")
  }

  test("normalize: diacritics fold per the strtr map") {
    assert(normalize("Šš Žž Àà Áá") == "sszzaaaa")
    assert(normalize("Çç Èè Ññ Øø") == "cceennoo")
    assert(normalize("Þþ") == "bb") // thorn -> B/b
    assert(normalize("ð") == "o")   // eth -> o (reference quirk)
    assert(normalize("Ææ") == "aa")
  }

  test("normalize: ß expands to Ss then lowercases to ss") {
    assert(normalize("straße") == "strasse")
    assert(normalize("ß") == "ss")
  }

  test("normalize: Ä Å Ö ä å ö are EXEMPT from folding and survive lowercased") {
    assert(normalize("Ä") == "ä")
    assert(normalize("Å") == "å")
    assert(normalize("Ö") == "ö")
    assert(normalize("äåö") == "äåö")
    assert(normalize("Märzen Öl Å") == "märzenölå")
  }

  test("normalize: non-Latin-1 codepoints become '?' then are stripped") {
    assert(normalize("日本語 abc") == "abc")
    assert(normalize("a€b") == "ab")
    assert(normalize("emoji 🎉 x") == "emojix")
  }

  test("normalize is idempotent") {
    val cases = Seq("Hello, World!", "Šš Žž", "äåö ÄÅÖ", "日本 abc", "a[b]c")
    for (c <- cases) assert(normalize(normalize(c)) == normalize(c))
  }

  test("createTitleKey: stops after >3 long words or >35 chars (crossing word included)") {
    // 4 words of length>3 -> include up to the 4th long word
    assert(createTitleKey("alpha beta gamma delta epsilon zeta") == "alphabetagammadelta")
    // short words don't count toward longWords but do toward keyLen
    assert(createTitleKey("a b c d e f") == "abcdef")
    // 35-char crossing: 4x9-char words = 36 chars -> stops at 4th word
    assert(createTitleKey("abcdefghi abcdefghi abcdefghi abcdefghi abcdefghi")
      == "abcdefghiabcdefghiabcdefghiabcdefghi")
    assert(createTitleKey("") == "")
  }

  test("authorMatch: reference decision list") {
    assert(authorMatch("Smith John", "Smith John"))
    assert(authorMatch("abc", "abc")) // equality short-circuits the length gate
    assert(!authorMatch("Sm J", "Sm Jo")) // < 6 chars
    assert(authorMatch("Smith John", "Smith John Edward")) // byte prefix
    assert(authorMatch("Smith John", "Smith J")) // word initial match
    assert(!authorMatch("Smith John", "Jones John")) // first word must equal
    assert(!authorMatch("Smith John", "Smith Karl")) // initial mismatch
  }

  test("levenshtein percentages: byte DP + asymmetric denominators") {
    assert(levenshteinBytes("kitten".getBytes, "sitting".getBytes) == 3)
    assert(levenshteinBytes("".getBytes, "abc".getBytes) == 3)
    // title: denominator = byte length of FIRST arg
    assert(math.abs(titleLevPct("abcdefghij", "abcdefghix") - 10.0) < 1e-9)
    assert(math.abs(titleLevPct("abcde", "abcd") - 20.0) < 1e-9)
    // author: denominator = codepoint length of first arg; ä is 2 bytes but 1 cp
    val pct = authorLevPct("äääää", "äääää") // identical: 0
    assert(pct == 0.0)
    assert(math.abs(authorLevPct("ääää", "äääx") - 50.0) < 1e-9) // 2 byte-edits (C3->x sub + A4 del) over 4 codepoints
  }

  test("isbn10to13: checksum per reference") {
    assert(isbn10to13("0306406152").contains("9780306406157"))
    assert(isbn10to13("080442957X").contains("9780804429573"))
    assert(isbn10to13("030640615").isEmpty)  // 9 chars
    assert(isbn10to13("03064061ab").isEmpty) // non-digit
  }

  test("strip punctuation helpers") {
    assert(stripTrailingPunctuation("Title /") == "Title")
    assert(stripTrailingPunctuation("Title.") == "Title")
    assert(stripTrailingPunctuation("Smith, A.") == "Smith, A.") // initial kept
    // abbreviation entries carry the dot (conf/abbreviations.lst.sample: 'ill.')
    assert(stripTrailingPunctuation("vol. ed.", Set("ed.")) == "vol. ed.")
    assert(stripLeadingPunctuation(" #!Title") == "Title")
    assert(createIdSortKey("rec00123") == "00123")
    assert(createIdSortKey("noDigits") == "noDigits")
    assert(extractYear("published 1987 in Prague").contains("1987"))
    assert(extractYear("c. -1200 bce").contains("-1200"))
  }

  test("stripLeadingArticle: case-insensitive first match wins, break after one") {
    assert(stripLeadingArticle("The Title") == "Title")
    assert(stripLeadingArticle("THE TITLE") == "TITLE")
    assert(stripLeadingArticle("an apple") == "apple")       // 'a ' must NOT match 'an'
    assert(stripLeadingArticle("a night") == "night")
    assert(stripLeadingArticle("Der Process") == "Process")
    assert(stripLeadingArticle("Another word") == "Another word") // no space after 'an'
    assert(stripLeadingArticle("the") == "the")               // shorter than 'the '
    // only ONE article stripped (reference breaks)
    assert(stripLeadingArticle("the la mer") == "la mer")
  }

  test("validateISO8601Date: strict shape + real calendar") {
    assert(validateISO8601Date("2024-01-15T10:30:00Z"))
    assert(validateISO8601Date("2024-02-29T00:00:00Z"))    // leap day
    assert(!validateISO8601Date("2023-02-29T00:00:00Z"))   // not a leap year
    assert(!validateISO8601Date("2024-02-30T10:00:00Z"))   // no Feb 30
    assert(!validateISO8601Date("2024-13-01T00:00:00Z"))   // no month 13
    assert(!validateISO8601Date("2024-01-15 10:30:00"))    // wrong shape
    assert(!validateISO8601Date("2024-01-15T10:30:00"))    // missing Z
    assert(!validateISO8601Date("2024-01-15T24:00:00Z"))   // hour 24
  }

  test("convertDateRange: floor-days pair, clamped") {
    assert(convertDateRange("1970-01-01,1970-01-02") == "0 1")
    assert(convertDateRange("1969-12-31,1970-01-01") == "-1 0")
    assert(convertDateRange("2024-01-01,2024-03-10") == "19723 19792")
    // clamps: start below -4371587 raised, end above 2932896 lowered
    assert(convertDateRange("-9999-01-01,9999-12-31").startsWith("-4371587 "))
    assert(convertDateRange("1970-01-01,9999-12-31").endsWith(" 2932896"))
    // malformed input must not throw (one bad record can't kill a task)
    assert(convertDateRange("2024-01-15") == null)       // no comma
    assert(convertDateRange("garbage,2024-01-01") == null)
    assert(convertDateRange(null) == null)
  }

  test("trimXMLWhitespace: whitespace between tags stripped, data whitespace preserved") {
    assert(trimXMLWhitespace("<r> <a>x y</a>  <b>z</b> </r>") == "<r><a>x y</a><b>z</b></r>")
    // element content with EDGE whitespace is data: the whole-element
    // alternative protects it (backreference \2)
    assert(trimXMLWhitespace("<t> hello </t>") == "<t> hello </t>")
    assert(trimXMLWhitespace("  <empty/>  ") == "<empty/>")
  }

  test("ucFirst: mb-aware first-codepoint uppercase") {
    assert(ucFirst("title") == "Title")
    assert(ucFirst("éclair") == "Éclair")
    assert(ucFirst("") == "")
    assert(ucFirst("a") == "A")
  }
}
