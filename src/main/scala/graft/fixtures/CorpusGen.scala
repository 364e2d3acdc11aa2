package graft.fixtures

import scala.collection.mutable
import scala.util.Random

/**
 * Deterministic synthetic `pages` corpus with planted duplicate classes
 * (FIXTURES.md §2). Pure Scala — the test harness parallelizes it into a
 * DataFrame; a fixed seed makes every run byte-identical (no wall clock,
 * no unseeded randomness).
 *
 * Planted kinds mirror the reference's evidence channels:
 *  - exact     : identical text, different host (shared-ISBN analog,
 *                classes/RecordManager.php:1500-1512)
 *  - near      : token mutations under the edit budget (title-lev% path,
 *                classes/RecordManager.php:1574-1612)
 *  - negative  : mutations past the threshold — must NOT cluster
 *  - substr    : one text embedded in a longer page
 *  - same-host : duplicate on one host — must NOT cluster under the
 *                cross-source rule (classes/RecordManager.php:1346)
 *  - lang      : identical text, different lang — must NOT cluster under
 *                the lang gate (format gate, classes/RecordManager.php:1489)
 *  - hot-band  : shared boilerplate block across many pages (skew;
 *                too-many-candidates guard, classes/RecordManager.php:1402)
 *  - chain     : A≈B≈C… pairwise near-dups (union-find transitivity,
 *                classes/RecordManager.php:1633-1707)
 */
object CorpusGen {

  final case class Page(url: String, warcTs: Long, html: Array[Byte],
                        text: String, lang: String, source: String)
  final case class Truth(url: String, classId: String, kind: String)
  final case class Corpus(pages: Seq[Page], truth: Seq[Truth]) {
    /** ground-truth positive url pairs (same class, kinds that must cluster) */
    def duplicatePairs(mustClusterKinds: Set[String]): Set[(String, String)] = {
      truth.filter(t => mustClusterKinds.contains(t.kind))
        .groupBy(_.classId).values.flatMap { members =>
          val urls = members.map(_.url).sorted
          for (i <- urls.indices; j <- (i + 1) until urls.size) yield (urls(i), urls(j))
        }.toSet
    }
  }

  private val vocab: Vector[String] = Vector(
    "the", "a", "of", "data", "spark", "table", "scan", "merge", "query",
    "row", "filter", "key", "join", "sort", "hash", "batch", "stream",
    "window", "group", "order", "value", "column", "vector", "line",
    "part", "small", "big", "fast", "slow", "agg", "dup", "customer")

  private def words(rnd: Random, n: Int): Vector[String] =
    Vector.fill(n)(vocab(rnd.nextInt(vocab.size)))

  private def mutate(rnd: Random, toks: Vector[String], edits: Int): Vector[String] = {
    var t = toks
    var i = 0
    while (i < edits && t.nonEmpty) {
      rnd.nextInt(3) match {
        case 0 => t = t.updated(rnd.nextInt(t.size), vocab(rnd.nextInt(vocab.size)))
        case 1 => t = t.patch(rnd.nextInt(t.size), Nil, 1)
        case 2 =>
          val p = rnd.nextInt(t.size + 1)
          t = t.patch(p, Seq(vocab(rnd.nextInt(vocab.size))), 0)
      }
      i += 1
    }
    t
  }

  def generate(seed: Long = 42L, nBase: Int = 400): Corpus = {
    val rnd = new Random(seed)
    val hosts = Vector("alpha", "beta", "gamma", "delta", "epsilon")
    val langs = Vector("en", "de", "fr")
    val pages = mutable.ArrayBuffer[Page]()
    val truth = mutable.ArrayBuffer[Truth]()
    var k = 0

    def add(text: String, lang: String, host: String,
            classId: String = null, kind: String = null): String = {
      val url = s"https://$host.example.com/doc/$k"
      pages += Page(url, 1700000000L + k * 3600L,
        s"<html><body>$text</body></html>".getBytes("UTF-8"), text, lang, host)
      if (classId != null) truth += Truth(url, classId, kind)
      k += 1
      url
    }

    // background singletons
    for (_ <- 0 until nBase)
      add(words(rnd, 40 + rnd.nextInt(80)).mkString(" "),
        langs(rnd.nextInt(langs.size)), hosts(rnd.nextInt(hosts.size)))

    // exact duplicate classes (2-4 members, cross-host)
    for (c <- 0 until 12) {
      val text = words(rnd, 60 + rnd.nextInt(40)).mkString(" ")
      val lang = langs(rnd.nextInt(langs.size))
      val n = 2 + rnd.nextInt(3)
      for (m <- 0 until n) add(text, lang, hosts((c + m) % hosts.size), s"exact-$c", "exact")
    }

    // near-duplicate classes: <= 3 edits on 80 tokens keeps J well above 0.7
    for (c <- 0 until 12) {
      val base = words(rnd, 80)
      val lang = langs(rnd.nextInt(langs.size))
      add(base.mkString(" "), lang, hosts(c % hosts.size), s"near-$c", "near")
      for (m <- 1 to 1 + rnd.nextInt(2))
        add(mutate(rnd, base, 1 + rnd.nextInt(3)).mkString(" "), lang,
          hosts((c + m) % hosts.size), s"near-$c", "near")
    }

    // negative-near: heavy mutation (~60% of tokens) — must not cluster
    for (c <- 0 until 8) {
      val base = words(rnd, 60)
      val lang = langs(rnd.nextInt(langs.size))
      add(base.mkString(" "), lang, hosts(c % hosts.size), s"neg-$c", "negative")
      add(mutate(rnd, base, 36).mkString(" "), lang,
        hosts((c + 1) % hosts.size), s"neg-$c", "negative")
    }

    // substring containment
    for (c <- 0 until 6) {
      val inner = words(rnd, 50)
      val lang = langs(rnd.nextInt(langs.size))
      add(inner.mkString(" "), lang, hosts(c % hosts.size), s"substr-$c", "substr")
      val padded = words(rnd, 15) ++ inner ++ words(rnd, 15)
      add(padded.mkString(" "), lang, hosts((c + 2) % hosts.size), s"substr-$c", "substr")
    }

    // same-host duplicates (cross-source gate test)
    for (c <- 0 until 5) {
      val text = words(rnd, 70).mkString(" ")
      val lang = langs(rnd.nextInt(langs.size))
      val host = hosts(c % hosts.size)
      add(text, lang, host, s"samehost-$c", "same-host")
      add(text, lang, host, s"samehost-$c", "same-host")
    }

    // lang-mismatch (lang gate test)
    for (c <- 0 until 5) {
      val text = words(rnd, 70).mkString(" ")
      add(text, "en", hosts(c % hosts.size), s"langmis-$c", "lang")
      add(text, "de", hosts((c + 1) % hosts.size), s"langmis-$c", "lang")
    }

    // hot-band skew: ONE boilerplate text repeated on 60 pages (the web's
    // "soft-404 / cookie-banner page" case). All 60 legitimately form one
    // exact cluster, but their identical MinHash signature makes every LSH
    // band bucket 60 deep — the skew the bucket cap + exact-channel star
    // reduction must absorb without O(m²) blowup.
    val boiler = words(rnd, 40).mkString(" ")
    for (c <- 0 until 60)
      add(boiler, "en", hosts(rnd.nextInt(hosts.size)), "hot-0", "hot-band")

    // chain components: consecutive near-dup chain of length 5
    for (c <- 0 until 3) {
      var cur = words(rnd, 80)
      val lang = langs(rnd.nextInt(langs.size))
      for (m <- 0 until 5) {
        add(cur.mkString(" "), lang, hosts(m % hosts.size), s"chain-$c", "chain")
        cur = mutate(rnd, cur, 2)
      }
    }

    Corpus(pages.toSeq, truth.toSeq)
  }
}
