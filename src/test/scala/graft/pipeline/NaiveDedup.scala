package graft.pipeline

import graft.fixtures.CorpusGen.Page

/**
 * Test-only O(n²) in-memory reference dedupe (SURVEY.md §5.2): exact
 * shingle-set Jaccard over every pair + the same gates, then union-find.
 * Independent of the Spark implementation (string shingles, no hashing)
 * so it can serve as the cluster-assignment oracle for recall/precision.
 */
object NaiveDedup {

  def shingleSet(text: String, n: Int): Set[String] = {
    val toks = text.split(" ", -1)
    if (toks.length == 0) Set.empty
    else if (toks.length < n) Set(toks.mkString(""))
    else toks.sliding(n).map(_.mkString("")).toSet
  }

  final case class Params(shingleSize: Int = 3, threshold: Double = 0.7,
                          containment: Double = 0.9,
                          requireSameLang: Boolean = false,
                          crossSourceOnly: Boolean = false,
                          titleLevMax: Option[Double] = None,
                          authorLevMax: Option[Double] = None,
                          /** author of a page (the web-text Page fixture
                            * has no author field; tests derive one) */
                          authorOf: Page => String = _ => "")

  /** Plain DP Levenshtein over BYTE arrays — independent of both Spark's
    * builtin (codepoints) and Normalize.levenshteinBytes. PHP
    * `levenshtein` is byte-level, so the reference gates are too. */
  private def lev(a: Array[Byte], b: Array[Byte]): Int = {
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    for (j <- 0 to b.length) prev(j) = j
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      Array.copy(cur, 0, prev, 0, b.length + 1)
    }
    prev(b.length)
  }

  private def utf8(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Reference title gate over the NORMALIZED texts in canonical (url
    * asc) order (RecordManager.php:1575-1590): BOTH sides must normalize
    * non-empty, then byte-lev over the first 255 BYTES × 100 / byte
    * length of the FIRST side's full normalized text, accepted when
    * < max. */
  private def levGateOk(aUrl: String, aText: String, bUrl: String,
                        bText: String, max: Double): Boolean = {
    val (ft, st) =
      if (aUrl <= bUrl) (aText, bText) else (bText, aText)
    val fn = graft.text.Normalize.normalize(ft)
    val sn = graft.text.Normalize.normalize(st)
    val fb = utf8(fn)
    fn.nonEmpty && sn.nonEmpty &&
      lev(fb.take(255), utf8(sn).take(255)) * 100.0 / fb.length < max
  }

  /** Reference author gate (RecordManager.php:1592-1611): skipped when
    * both normalized authors are empty; reject when exactly one is
    * empty; authorMatch short-circuits to accept; else byte-lev(255) ×
    * 100 / CODEPOINT length of the first side, accepted when <= max. */
  private def authorGateOk(aUrl: String, aAuthor: String, bUrl: String,
                           bAuthor: String, max: Double): Boolean = {
    val (fa, sa) =
      if (aUrl <= bUrl) (aAuthor, bAuthor) else (bAuthor, aAuthor)
    val fn = graft.text.Normalize.normalize(fa)
    val sn = graft.text.Normalize.normalize(sa)
    if (fn.isEmpty && sn.isEmpty) true
    else if (fn.isEmpty || sn.isEmpty) false
    else if (graft.text.Normalize.authorMatch(fn, sn)) true
    else {
      val fb = utf8(fn)
      lev(fb.take(255), utf8(sn).take(255)) * 100.0 /
        fn.codePointCount(0, fn.length) <= max
    }
  }

  /** All verified duplicate pairs (url_a < url_b). */
  def duplicatePairs(pages: Seq[Page], p: Params = Params()): Set[(String, String)] = {
    val sh = pages.map(pg => (pg, shingleSet(pg.text, p.shingleSize)))
    val out = scala.collection.mutable.Set[(String, String)]()
    for (i <- sh.indices; j <- (i + 1) until sh.size) {
      val (a, sa) = sh(i); val (b, sb) = sh(j)
      val gateOk = (!p.requireSameLang || a.lang == b.lang) &&
        (!p.crossSourceOnly || a.source != b.source)
      if (gateOk && sa.nonEmpty && sb.nonEmpty) {
        val inter = (sa & sb).size
        val jac = inter.toDouble / (sa.size + sb.size - inter)
        val cont = inter.toDouble / math.min(sa.size, sb.size)
        if ((jac >= p.threshold || cont >= p.containment) &&
            p.titleLevMax.forall(m => levGateOk(a.url, a.text, b.url, b.text, m)) &&
            p.authorLevMax.forall(m =>
              authorGateOk(a.url, p.authorOf(a), b.url, p.authorOf(b), m))) {
          val (u, v) = if (a.url < b.url) (a.url, b.url) else (b.url, a.url)
          out += ((u, v))
        }
      }
    }
    out.toSet
  }

  /** Transitive clusters over the verified pairs: url -> min member. */
  def clusters(pairs: Set[(String, String)]): Map[String, String] = {
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val verts = pairs.flatMap(e => Seq(e._1, e._2))
    verts.groupBy(find).values.flatMap { vs => val m = vs.min; vs.map(_ -> m) }.toMap
  }

  /** Same-cluster url pairs implied by a clustering (for recall compares). */
  def clusterPairs(clusters: Map[String, String]): Set[(String, String)] =
    clusters.groupBy(_._2).values.flatMap { m =>
      val urls = m.keys.toSeq.sorted
      for (i <- urls.indices; j <- (i + 1) until urls.size) yield (urls(i), urls(j))
    }.toSet
}
