package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Single-pass cluster merge fold — every per-field semantic of the
 * reference's `mergeRecords` (classes/SolrUpdater.php:1204-1268) in ONE
 * aggregation buffer, so the merge stage is one shuffle of the member
 * relation instead of three aggregations + a window + two joins:
 *
 *  - `size`                — true member count
 *  - `rep_text`/`rep_url`  — keep-longest text (min url tiebreak): the
 *    reference keeps the longest string per single-valued field
 *  - `first_lang`          — first-record-wins in member (url) order
 *  - `members`             — BOUNDED: the `cap` smallest urls, sorted; a
 *    degenerate boilerplate cluster costs O(cap) buffer, never O(m)
 *  - `langs`               — case-insensitive first-wins union
 *    (MetadataUtils::array_iunique, classes/MetadataUtils.php:288-298):
 *    one value per lower-cased key, earliest member's casing, member order
 *  - `sources`             — distinct, sorted
 *
 * Inputs are assumed non-null (the pages contract mandates url/text/lang;
 * `withSource` synthesizes source). String order is code-unit order —
 * identical to Spark/DuckDB binary collation for the ASCII keys this
 * pipeline produces.
 */
final case class MergeBuf(
    count: Long,
    repLen: Long, repUrl: String, repText: String,
    firstUrl: String, firstLang: String,
    // nMembers mirrors members.length: List.length is O(n) and would cost
    // O(cap) per input row on a degenerate cluster
    members: List[String], nMembers: Int, membersMax: String,
    // (lowercased lang, url, original lang) — min url per key
    langs: List[(String, String, String)],
    sources: List[String])

final case class MergeOut(
    size: Long, rep_text: String, rep_url: String, first_lang: String,
    members: Seq[String], langs: Seq[String], sources: Seq[String])

class ClusterFold(cap: Int)
    extends Aggregator[(String, String, String, String), MergeBuf, MergeOut] {

  override def zero: MergeBuf =
    MergeBuf(0L, -1L, null, null, null, null, Nil, 0, null, Nil, Nil)

  private def better(len: Long, url: String, bLen: Long, bUrl: String): Boolean =
    len > bLen || (len == bLen && (bUrl == null || url < bUrl))

  override def reduce(b: MergeBuf, in: (String, String, String, String)): MergeBuf = {
    val (url, text, lang, source) = in
    val len = if (text == null) 0L else text.length.toLong
    var r = b.copy(count = b.count + 1)
    if (better(len, url, r.repLen, r.repUrl))
      r = r.copy(repLen = len, repUrl = url, repText = text)
    if (r.firstUrl == null || url < r.firstUrl)
      r = r.copy(firstUrl = url, firstLang = lang)
    // bounded smallest-cap member set: O(1) append while under cap; at cap
    // only a url below the cached max pays the O(cap) replace
    if (r.nMembers < cap) {
      val mm = if (r.membersMax == null || url > r.membersMax) url else r.membersMax
      r = r.copy(members = url :: r.members, nMembers = r.nMembers + 1, membersMax = mm)
    } else if (cap > 0 && url < r.membersMax) {
      val kept = url :: remofirst(r.members, r.membersMax)
      r = r.copy(members = kept, membersMax = kept.max)
    }
    val lk = lang.toLowerCase(java.util.Locale.ROOT)
    r = r.copy(langs = upsertLang(r.langs, lk, url, lang))
    if (!r.sources.contains(source)) r = r.copy(sources = source :: r.sources)
    r
  }

  private def remofirst(xs: List[String], x: String): List[String] = xs match {
    case h :: t => if (h == x) t else h :: remofirst(t, x)
    case Nil => Nil
  }

  private def upsertLang(xs: List[(String, String, String)], lk: String,
                         url: String, lang: String): List[(String, String, String)] =
    xs.find(_._1 == lk) match {
      case None => (lk, url, lang) :: xs
      case Some(e) if url < e._2 => (lk, url, lang) :: xs.filterNot(_._1 == lk)
      case Some(_) => xs
    }

  override def merge(a: MergeBuf, b: MergeBuf): MergeBuf = {
    if (a.count == 0) return b
    if (b.count == 0) return a
    val rep = if (better(a.repLen, a.repUrl, b.repLen, b.repUrl)) a else b
    val first = if (b.firstUrl == null ||
      (a.firstUrl != null && a.firstUrl < b.firstUrl)) a else b
    val members = (a.members ++ b.members).sorted.take(cap)
    val langs = b.langs.foldLeft(a.langs) { case (acc, (lk, u, l)) =>
      upsertLang(acc, lk, u, l)
    }
    MergeBuf(a.count + b.count, rep.repLen, rep.repUrl, rep.repText,
      first.firstUrl, first.firstLang,
      members, members.length, if (members.isEmpty) null else members.last,
      langs, (a.sources ++ b.sources).distinct)
  }

  override def finish(r: MergeBuf): MergeOut =
    MergeOut(r.count, r.repText, r.repUrl, r.firstLang,
      r.members.sorted,
      r.langs.sortBy(_._2).map(_._3),
      r.sources.sorted)

  override def bufferEncoder: Encoder[MergeBuf] = Encoders.product[MergeBuf]
  override def outputEncoder: Encoder[MergeOut] = Encoders.product[MergeOut]
}
