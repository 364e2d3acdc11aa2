package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** URL canonicalization contract (hand-specified expected outputs) and
  * URL-level dedup semantics. */
class UrlOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("url").select(UrlOps.canonicalize(col("url"))).head().getString(0)

  test("canonicalize: case, default ports, fragments, trailing slash") {
    assert(canon("https://Site3.Example.COM/p/1/") == "https://site3.example.com/p/1")
    assert(canon("HTTP://site0.example.com:80/p/2") == "http://site0.example.com/p/2")
    assert(canon("https://site1.example.com:443/p/3#section-2") == "https://site1.example.com/p/3")
    assert(canon("https://h.com/a///") == "https://h.com/a")
    // root path: trailing slash stripped to the bare authority
    assert(canon("https://h.com/") == "https://h.com")
  }

  test("canonicalize: non-default ports and other schemes keep their port") {
    assert(canon("https://h.com:8080/x") == "https://h.com:8080/x")
    assert(canon("http://h.com:443/x") == "http://h.com:443/x") // :443 is not http's default
    assert(canon("ftp://H.com:80/x") == "ftp://h.com:80/x")
  }

  test("canonicalize: tracking params dropped, the rest sorted; bare params too") {
    assert(canon("http://h.com/p?utm_source=feed&b=2&a=1") == "http://h.com/p?a=1&b=2")
    assert(canon("http://h.com/p?a=1&utm_campaign=x&fbclid=abc&z=9") == "http://h.com/p?a=1&z=9")
    assert(canon("http://h.com/p?fbclid&gclid=1") == "http://h.com/p")
    // all params tracking -> no '?' at all
    assert(canon("http://h.com/p?utm_medium=email") == "http://h.com/p")
    // 'ref' is dropped but 'referrer'/'refresh' are NOT (anchored match)
    assert(canon("http://h.com/p?referrer=x&ref=y") == "http://h.com/p?referrer=x")
  }

  test("canonicalize: non-URL strings pass through unchanged") {
    assert(canon("not a url 17") == "not a url 17")
    assert(canon("/relative/path?utm_source=x") == "/relative/path?utm_source=x")
  }

  test("host: lowercased, port stripped, empty for non-URLs") {
    val got = Seq("https://Site3.Example.COM:8443/p/1", "http://a.b/x", "junk")
      .toDF("url").select(UrlOps.host(col("url"))).as[String].collect().toSeq
    assert(got == Seq("site3.example.com", "a.b", ""))
  }

  test("domainCap: keeps the k smallest ids per host; plan uses WindowGroupLimit") {
    val docs = (1L to 20L).map(i => (i, s"https://h${i % 2}.com/p/$i")).toDF("doc_id", "url")
    val capped = UrlOps.domainCap(docs, 3)
    val got = capped.select("doc_id").as[Long].collect().toSet
    // host h1: odd ids 1,3,5…; host h0: even ids 2,4,6…
    assert(got == Set(1L, 3L, 5L, 2L, 4L, 6L))
    // the rank≤k filter must push a per-partition top-k below the shuffle
    // (WindowGroupLimit) so a hot host never ships its full page set
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("urlDedup: spelling variants collapse; kept id is the min; counts exact") {
    val docs = Seq(
      (10L, "https://A.com/x/"),
      (11L, "HTTPS://a.com:443/x"),
      (12L, "https://a.com/x?utm_source=f#frag"),
      (20L, "https://b.com/y"),
      (21L, "https://b.com/y?page=2") // different real param: NOT a dup
    ).toDF("doc_id", "url")
    val got = UrlOps.urlDedup(docs).as[(String, Long, Long)].collect().toSet
    assert(got == Set(
      ("https://a.com/x", 10L, 3L),
      ("https://b.com/y", 20L, 1L),
      ("https://b.com/y?page=2", 21L, 1L)))
  }

  test("blockHosts: exact host and parent-domain entries; survivors intact") {
    val docs = Seq(
      (1L, "https://ads.tracker.example/a"),   // blocked via parent tracker.example
      (2L, "https://tracker.example/b"),       // blocked exactly
      (3L, "https://example.com/keep"),        // 'example' alone is NOT a list entry
      (4L, "https://deep.sub.ads.tracker.example/c"), // 4-deep parent match
      (5L, "https://clean.org/x")
    ).toDF("doc_id", "url")
    val bl = Seq("tracker.example").toDF("host")
    val kept = UrlOps.blockHosts(docs, bl).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 5L))
  }

  test("blockHosts: equi-join plan — no nested-loop scan of the list per row") {
    val docs = Seq((1L, "https://a.com/x")).toDF("doc_id", "url")
    val bl = Seq("b.com").toDF("host")
    val plan = UrlOps.blockHosts(docs, bl).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast hash join in:\n$plan")
  }
}
