package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL canonicalization and URL-level dedup for web-text pipelines.
 *
 * Content dedup (MinHash/SimHash/exact — `graft.pipeline.DedupPipeline`)
 * is preceded in every production web pipeline by a much cheaper pass:
 * collapse re-crawls of the SAME resource whose URLs differ only in
 * scheme/host case, default ports, fragments, tracking parameters, or
 * query-parameter order (RefinedWeb's exact-URL dedup, CCNet/C4's URL
 * normalization are the public precedents; the reference's analogous
 * role is its id/oai_id-keyed record identity,
 * /root/reference/classes/RecordManager.php:1258-1266). The rules here
 * are the RFC 3986 §6 "normalizations that preserve semantics" plus the
 * conventional tracking-parameter strip.
 *
 * Scale notes (100 TB design point):
 *  - everything is codegen'd builtin expressions (regexp_* / split /
 *    array_sort) — no UDFs, stays inside whole-stage codegen; the
 *    canonical form is computed in the scan stage, so downstream
 *    groupBy shuffles carry (canon, doc_id) only — never page text.
 *  - `urlDedup` is a map-side-combinable min/count aggregation; hot
 *    canonical URLs (a portal page crawled 10^6 times) cost a skewed
 *    reduce key, never a window sort; AQE skew splitting applies.
 */
object UrlOps {

  /** Query parameters dropped by canonicalize: pure click/campaign
    * tracking, never content-addressing. Kept deliberately short —
    * false positives here silently merge DIFFERENT pages. */
  val trackingParamRe: String =
    "^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_cid|mc_eid|ref)(=.*)?$"

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  // group-free variant for composing: keeps appended groups at index 1
  private val schemePfx = "^[A-Za-z][A-Za-z0-9+.-]*://"

  /** RFC 3986 §6-preserving canonical form of an absolute http(s) URL:
    * lowercase scheme and authority, strip the scheme's default port
    * (:80 http / :443 https), drop the fragment, strip trailing slashes
    * from the path, drop tracking query parameters and sort the rest.
    * Strings that do not look like absolute URLs pass through unchanged
    * (relative refs / junk rows are a content-filter concern, not a
    * canonicalization one). Builtins only — codegen'd, no UDF. */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, schemeRe, 1))
    val auth = lower(regexp_extract(noFrag, schemePfx + "([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
    val path = regexp_replace(
      regexp_extract(noFrag, schemePfx + "[^/?#]*([^?#]*)", 1), "/+$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= lit("") && !p.rlike(trackingParamRe)))
    val qs = when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
      .otherwise(lit(""))
    when(scheme === "", url)
      .otherwise(concat(scheme, lit("://"), host, path, qs))
  }

  /** Lowercased host (no port) of an absolute URL; "" for non-URLs. */
  def host(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, schemePfx + "([^/?#]*)", 1)),
      ":[0-9]+$", "")

  /** URL-level dedup table: one row per canonical URL with the kept
    * representative (min doc_id — deterministic) and the collapse
    * count. Anti-joining the corpus against (doc_id != kept_doc_id)
    * removes re-crawls before any content hashing runs. */
  def urlDedup(docs: DataFrame, urlCol: String = "url",
               idCol: String = "doc_id"): DataFrame =
    docs.select(canonicalize(col(urlCol)).as("canon"), col(idCol))
      .groupBy("canon")
      .agg(min(col(idCol)).as("kept_doc_id"), count(lit(1)).as("n_docs"))

  /** Per-host document counts over canonical URLs — the standard input
    * to domain block/allow lists and per-domain sampling caps. */
  def domainCounts(docs: DataFrame, urlCol: String = "url"): DataFrame =
    docs.groupBy(host(col(urlCol)).as("host"))
      .agg(count(lit(1)).as("n_docs"))

  /** Per-domain sampling cap: keep at most `maxPerHost` documents per
    * host, deterministically — the standard guard against one portal
    * dominating a training mix (C4/RefinedWeb-style domain balancing).
    * `orderCol` picks WHICH rows survive (default: ascending id, fully
    * oracle-replayable; pass a hash column, e.g. `xxhash64(col("url"))`,
    * for an unbiased sample).
    *
    * Scale notes: the `row_number ≤ k` filter is recognized by Spark's
    * WindowGroupLimit rule, which inserts a per-PARTITION top-k BEFORE
    * the shuffle — a mega-host (10^8 pages) ships only k·(input
    * partitions touching it) rows to the reduce side, never its full
    * page set, so hot domains cannot skew the exchange. */
  /** Domain blocklist filter: drop documents whose host (or any parent
    * domain — `ads.tracker.example` is blocked by `tracker.example`)
    * appears in the blocklist. The public precedent is C4/RefinedWeb's
    * bad-domain lists (adult/spam/SEO farms) applied before any content
    * work.
    *
    * Scale shape: a blocklist is small (10^4–10^6 hosts) next to the
    * corpus. Parent-domain matching explodes each doc's host into its
    * ≤`maxLabels` domain suffixes (bounded fan-out, computed in the scan
    * stage), then a broadcast LEFT SEMI EQUI-join marks blocked ids — an
    * `array_contains` join condition would instead plan a
    * BroadcastNestedLoopJoin that scans the whole list per row. The
    * corpus-side anti-join runs on 8-byte ids only; the blocked-id set is
    * a small fraction of the corpus in practice and AQE converts that
    * anti-join to a broadcast at runtime when it is. */
  def blockHosts(docs: DataFrame, blocklist: DataFrame, urlCol: String = "url",
                 hostCol: String = "host", idCol: String = "doc_id",
                 maxLabels: Int = 5): DataFrame = {
    val h = host(col(urlCol))
    // suffixes of the host with at least 2 labels: "a.b.c.d" ->
    // ["a.b.c.d","b.c.d","c.d"], capped at maxLabels labels deep
    val labels = split(h, "\\.")
    val n = size(labels)
    val sufs = filter(
      transform(sequence(lit(0), greatest(least(n - 2, lit(maxLabels - 1)), lit(0))),
        i => array_join(slice(labels, i + 1, n - i), ".")),
      s => s =!= lit(""))
    val blockedIds = docs
      .select(col(idCol), explode(sufs).as("_hsuf"))
      .join(broadcast(blocklist.select(col(hostCol).as("_hsuf"))), Seq("_hsuf"), "left_semi")
      .select(idCol).distinct()
    docs.join(blockedIds, Seq(idCol), "left_anti")
  }

  def domainCap(docs: DataFrame, maxPerHost: Int, urlCol: String = "url",
                idCol: String = "doc_id",
                orderCol: Option[Column] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(host(col(urlCol)).as("host"))
      .orderBy(orderCol.getOrElse(col(idCol)), col(idCol))
    docs.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= maxPerHost)
      .drop("_rk")
  }
}
