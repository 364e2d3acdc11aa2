package graft.text

import java.nio.charset.StandardCharsets.UTF_8

/**
 * Byte-identical re-specification of the reference's string-normalization
 * contract (reference: classes/MetadataUtils.php:141-153 and friends).
 *
 * The reference normalizer is a PHP byte pipeline:
 *   1. `strtr` diacritic fold (Ä/Å/Ö/ä/å/ö deliberately EXCLUDED from the
 *      map; `ß`→"Ss", `æ`→"a", `ð`→"o"),
 *   2. `utf8_decode` — UTF-8 → Latin-1; any codepoint > U+00FF becomes '?',
 *   3. strip the byte classes [\x00-\x20\x21-\x2F\x3A-\x40\x7B-\xC3
 *      \xC6-\xD5\xD7-\xE3\xE6-\xF5\xF7-\xFF] — survivors are exactly
 *      digits 0-9, A-Z, the five bytes `[ \ ] ^ _ `` ` ``, a-z, and the
 *      Latin-1 bytes for Ä Å Ö ä å ö,
 *   4. lowercase + trim (trim is a no-op: whitespace was stripped in 3),
 *   5. `utf8_encode` back to UTF-8.
 *
 * We model the post-`utf8_decode` intermediate as a sequence of Latin-1
 * codepoints and perform each step on codepoints, which reproduces the
 * reference byte-for-byte for all Latin-1-expressible inputs (and maps
 * everything else to the same '?'-then-stripped fate).
 *
 * These are deliberately pure JVM functions: the Spark pipeline wraps them
 * at the boundary (one scan-side projection), keeping the contract testable
 * without a SparkSession.
 */
object Normalize {

  /** Diacritic fold map (reference: classes/MetadataUtils.php:142-146).
    * Note the commented-out entries in the reference — Ä Å Ö ä å ö are
    * intentionally absent — and the 1→2 expansion 'ß'→"Ss". */
  private val fold: Map[Char, String] = Map(
    'Š' -> "S", 'š' -> "s", 'Ž' -> "Z", 'ž' -> "z", 'À' -> "A", 'Á' -> "A",
    'Â' -> "A", 'Ã' -> "A", 'Æ' -> "A", 'Ç' -> "C", 'È' -> "E", 'É' -> "E",
    'Ê' -> "E", 'Ë' -> "E", 'Ì' -> "I", 'Í' -> "I", 'Î' -> "I", 'Ï' -> "I",
    'Ñ' -> "N", 'Ò' -> "O", 'Ó' -> "O", 'Ô' -> "O", 'Õ' -> "O", 'Ø' -> "O",
    'Ù' -> "U", 'Ú' -> "U", 'Û' -> "U", 'Ü' -> "U", 'Ý' -> "Y", 'Þ' -> "B",
    'ß' -> "Ss", 'à' -> "a", 'á' -> "a", 'â' -> "a", 'ã' -> "a", 'æ' -> "a",
    'ç' -> "c", 'è' -> "e", 'é' -> "e", 'ê' -> "e", 'ë' -> "e", 'ì' -> "i",
    'í' -> "i", 'î' -> "i", 'ï' -> "i", 'ð' -> "o", 'ñ' -> "n", 'ò' -> "o",
    'ó' -> "o", 'ô' -> "o", 'õ' -> "o", 'ø' -> "o", 'ù' -> "u", 'ú' -> "u",
    'û' -> "u", 'ü' -> "u", 'ý' -> "y", 'þ' -> "b", 'ÿ' -> "y")

  /** Latin-1 bytes that survive the strip (step 3): 0x30-0x39, 0x41-0x7A
    * (A-Z, `[ \ ] ^ _ `` ` ``, a-z), and Ä Å Ö ä å ö. */
  @inline private def survives(cp: Int): Boolean =
    (cp >= 0x30 && cp <= 0x39) || (cp >= 0x41 && cp <= 0x7A) ||
      cp == 0xC4 || cp == 0xC5 || cp == 0xD6 ||
      cp == 0xE4 || cp == 0xE5 || cp == 0xF6

  /** Lowercase on the Latin-1 survivors (step 4). */
  @inline private def low(cp: Int): Int =
    if (cp >= 'A' && cp <= 'Z') cp + 0x20
    else if (cp == 0xC4 || cp == 0xC5 || cp == 0xD6) cp + 0x20 // Ä Å Ö
    else cp

  /** Reference `normalize` (classes/MetadataUtils.php:141-153). */
  def normalize(s: String): String = {
    if (s == null) return null
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      val folded = if (cp <= 0xFFFF) fold.getOrElse(cp.toChar, null) else null
      if (folded != null) {
        // folded output is ASCII; apply steps 2-4 per char
        var j = 0
        while (j < folded.length) {
          val c = folded.charAt(j)
          if (survives(c)) sb.append(low(c).toChar)
          j += 1
        }
      } else {
        // utf8_decode: > U+00FF -> '?' (0x3F, then stripped)
        val l1 = if (cp > 0xFF) 0x3F else cp
        if (survives(l1)) sb.appendCodePoint(low(l1))
      }
    }
    sb.toString
  }

  /** Reference `createTitleKey` (classes/MetadataUtils.php:97-132):
    * concatenate space-separated words until >3 words of length>3 OR
    * accumulated length >35 (the threshold-crossing word is INCLUDED —
    * the reference checks after appending), then normalize. The
    * full-title-prefix escape hatch (keyLen>100) is config the reference
    * ships empty; the graft pins it off. */
  def createTitleKey(title: String): String = {
    if (title == null) return null
    val words = title.split(" ", -1)
    val key = new java.lang.StringBuilder
    var longWords = 0
    var keyLen = 0
    var k = 0
    var break = false
    while (k < words.length && !break) {
      val w = words(k)
      key.append(w)
      val wl = w.codePointCount(0, w.length)
      if (wl > 3) longWords += 1
      keyLen += wl
      if (longWords > 3 || keyLen > 35) break = true
      k += 1
    }
    normalize(key.toString)
  }

  /** Reference `authorMatch` (classes/MetadataUtils.php:163-194).
    * Quirks preserved: length gate counts CODEPOINTS but the prefix
    * comparison is `strncmp` over BYTES with n = min codepoint length;
    * the per-word initial check compares the first BYTE. */
  def authorMatch(a1: String, a2: String): Boolean = {
    if (a1 == a2) return true
    val l1 = a1.codePointCount(0, a1.length)
    val l2 = a2.codePointCount(0, a2.length)
    if (l1 < 6 || l2 < 6) return false
    val b1 = a1.getBytes(UTF_8)
    val b2 = a2.getBytes(UTF_8)
    val n = math.min(l1, l2)
    var i = 0
    var prefixEq = true
    while (i < n && prefixEq) {
      if (i >= b1.length || i >= b2.length || b1(i) != b2(i)) prefixEq = false
      i += 1
    }
    if (prefixEq) return true
    val w1 = a1.split(" ", -1)
    val w2 = a2.split(" ", -1)
    val m = math.min(w1.length, w2.length)
    var k = 0
    while (k < m) {
      if (w1(k) != w2(k)) {
        if (k == 0) return false
        val f1 = w1(k).getBytes(UTF_8)
        val f2 = w2(k).getBytes(UTF_8)
        val c1: Int = if (f1.length > 0) f1(0) & 0xFF else -1
        val c2: Int = if (f2.length > 0) f2(0) & 0xFF else -1
        if (c1 != c2) return false
      }
      k += 1
    }
    true
  }

  /** PHP `levenshtein` = byte-level edit distance. */
  def levenshteinBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = a.length; val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    var prev = Array.tabulate(m + 1)(identity)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i
      var j = 1
      while (j <= m) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  /** Reference title similarity rejection metric
    * (classes/RecordManager.php:1583-1584): levenshtein over the first 255
    * BYTES, denominator = BYTE length of the FIRST argument (asymmetric).
    * Reject when >= 10. */
  def titleLevPct(orig: String, cand: String): Double = {
    val ob = orig.getBytes(UTF_8)
    val cb = cand.getBytes(UTF_8)
    val lev = levenshteinBytes(ob.take(255), cb.take(255))
    lev.toDouble / ob.length * 100.0
  }

  /** Reference author similarity metric (classes/RecordManager.php:1602-1604):
    * same byte-level levenshtein but denominator = CODEPOINT length of the
    * first argument. Reject when > 20. */
  def authorLevPct(orig: String, cand: String): Double = {
    val ob = orig.getBytes(UTF_8)
    val cb = cand.getBytes(UTF_8)
    val lev = levenshteinBytes(ob.take(255), cb.take(255))
    lev.toDouble / orig.codePointCount(0, orig.length) * 100.0
  }

  /** Reference `isbn10to13` (classes/MetadataUtils.php:53-66). Returns
    * None where the reference returns false. */
  def isbn10to13(isbn: String): Option[String] = {
    if (isbn == null || isbn.length != 10) return None
    var i = 0
    while (i < 9) {
      if (!Character.isDigit(isbn.charAt(i))) return None
      i += 1
    }
    val last = isbn.charAt(9)
    if (!Character.isDigit(last) && last != 'x' && last != 'X') return None
    def d(k: Int) = isbn.charAt(k) - '0'
    val sum = 38 + 3 * (d(0) + d(2) + d(4) + d(6) + d(8)) + d(1) + d(3) + d(5) + d(7)
    val check = (10 - (sum % 10)) % 10
    Some("978" + isbn.substring(0, 9) + check)
  }

  /** Reference `stripTrailingPunctuation` (classes/MetadataUtils.php:227-246):
    * rtrim ` /:;,=([`, then strip one final '.' unless it terminates a
    * space-preceded initial ("Smith, A.") or a configured abbreviation. */
  def stripTrailingPunctuation(str: String, abbreviations: Set[String] = Set.empty): String = {
    var s = str.reverse.dropWhile(c => " /:;,=([".indexOf(c) >= 0).reverse
    if (s.endsWith(".") && !(s.length >= 3 && s.charAt(s.length - 3) == ' ')) {
      val p = s.lastIndexOf(' ')
      val lastWord = if (p > 0) s.substring(p + 1) else s
      if (!abbreviations.contains(lastWord)) s = s.substring(0, s.length - 1)
    }
    s
  }

  /** Reference `stripLeadingPunctuation` (classes/MetadataUtils.php:256-259). */
  def stripLeadingPunctuation(str: String, punctuation: String = " \\#!?/:;.,=(['\""): String =
    str.dropWhile(c => punctuation.indexOf(c) >= 0)

  /** Default article list for `stripLeadingArticle`. The reference loads
    * `MetadataUtils::$articles` from config (classes/MetadataUtils.php:44);
    * this is the usual list, trailing space included as the reference
    * entries carry it. */
  val defaultArticles: Seq[String] =
    Seq("a ", "an ", "the ", "el ", "la ", "le ", "der ", "die ", "das ")

  /** Reference `stripLeadingArticle` (classes/MetadataUtils.php:266-278):
    * first article whose BYTES case-insensitively prefix the string
    * (strncasecmp is ASCII-case-folding) is stripped; break after one. */
  def stripLeadingArticle(str: String, articles: Seq[String] = defaultArticles): String = {
    articles.foreach { article =>
      if (str.length >= article.length &&
          str.substring(0, article.length).equalsIgnoreCase(article))
        return str.substring(article.length)
    }
    str
  }

  private val iso8601 = "^(\\d{4})-(\\d{2})-(\\d{2})T(\\d{2}):(\\d{2}):(\\d{2})Z$".r

  /** Reference `validateISO8601Date` (classes/MetadataUtils.php:323-336):
    * strict `YYYY-MM-DDTHH:MM:SSZ` shape AND a real calendar datetime
    * (the reference compares gmmktime's normalized epoch with strtotime's
    * literal parse — equal only when nothing wrapped, e.g. no Feb 30). */
  def validateISO8601Date(date: String): Boolean = date match {
    case iso8601(y, mo, d, h, mi, s) =>
      try {
        java.time.LocalDateTime.of(y.toInt, mo.toInt, d.toInt, h.toInt, mi.toInt, s.toInt)
        true
      } catch { case _: java.time.DateTimeException => false }
    case _ => false
  }

  /** Reference `convertDateRange` (classes/MetadataUtils.php:345-363):
    * "start,end" date pair → floor(days since epoch, UTC) pair, start
    * clamped up to -4371587 and end down to 2932896, space-joined.
    * The reference parses with PHP strtotime; this re-specification pins
    * the ISO `YYYY-MM-DD` subset the pipeline feeds it. */
  def convertDateRange(range: String): String = {
    if (range == null) return null
    val parts = range.split(",", 2)
    if (parts.length < 2) return null
    try {
      def days(s: String): Long =
        java.time.LocalDate.parse(s.trim).toEpochDay
      val start = math.max(days(parts(0)), -4371587L)
      val end = math.min(days(parts(1)), 2932896L)
      s"$start $end"
    } catch {
      // reference strtotime returns false on garbage; a malformed record
      // yields null instead of killing the task
      case _: java.time.format.DateTimeParseException => null
    }
  }

  /** Reference `trimXMLWhitespace` (classes/MetadataUtils.php:372-375):
    * strip whitespace BETWEEN tags but never inside element text —
    * whole-element alternative first so `<t> x </t>`'s data whitespace
    * survives. Same PCRE, Java syntax. */
  def trimXMLWhitespace(xml: String): String =
    xml.replaceAll("\\s*(<([^>]*)>[^<]*</\\2>|<[^>]*>)\\s*", "$1")

  /** Reference `ucFirst` (classes/MetadataUtils.php:431-440): mb-aware
    * first-character uppercase (codepoint, not UTF-16 unit). */
  def ucFirst(s: String): String =
    if (s == null || s.isEmpty) s
    else {
      val n = Character.charCount(s.codePointAt(0))
      // Locale.ROOT: host locale must not leak in (tr-TR would turn
      // 'i' into dotted 'İ')
      s.substring(0, n).toUpperCase(java.util.Locale.ROOT) + s.substring(n)
    }

  /** Reference `createIdSortKey` (classes/MetadataUtils.php:308-314):
    * trailing digit run if present, else the whole id. */
  def createIdSortKey(id: String): String = {
    val m = "(\\d+)$".r.findFirstIn(id)
    m.getOrElse(id)
  }

  /** Reference `extractYear` (classes/MetadataUtils.php:416-422): first
    * (optionally negative) 4-digit run. */
  def extractYear(s: String): Option[String] =
    "(-?\\d{4})".r.findFirstMatchIn(s).map(_.group(1))

  /** Reference `normalizeUnicode` (classes/MetadataUtils.php:449-463);
    * reference config ships NFKC (conf/recordmanager.ini.sample:43). */
  def normalizeUnicode(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)

  /** Reference `formatTimestamp` (classes/MetadataUtils.php:402-407). */
  def formatTimestamp(epochSeconds: Long): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochSecond(epochSeconds))
}
