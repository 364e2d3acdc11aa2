package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WET-style text extraction from raw page HTML.
  *
  * The input contract (BASELINE input_hint) carries the page payload as
  * `html: binary` next to the extracted `text`; real ingest has to
  * produce the latter from the former. This is the regex tier every
  * public pipeline starts from (jusText/trafilatura-class boilerplate
  * models are out of scope — no such models in this container; the
  * Common Crawl WET extraction itself is tag-strip + whitespace
  * normalization):
  *
  *   1. drop `<script>`/`<style>` element CONTENT (lazy, case-
  *    insensitive, dot-matches-newline; two passes because RE2-class
  *    engines — the DuckDB oracle replays these patterns — have no
  *    backreferences for a combined `<(script|style)>...</\1>`),
  *   2. strip remaining tags to a space (so `a<br>b` keeps its word
  *      boundary),
  *   3. unescape the five predefined entities plus `&nbsp;`/`&#39;`,
  *      `&amp;` strictly LAST so `&amp;lt;` yields the literal "&lt;"
  *      and never double-unescapes,
  *   4. collapse whitespace runs and trim.
  *
  * Per-row codegen regexp builtins, no UDF, no shuffle — composes into
  * the scan stage. All patterns are anchored-free with linear RE2-safe
  * shapes; the `.*?` in step 1 is bounded by the closing tag literal. */
object HtmlOps {

  /** Extracted plain text from a raw HTML payload (binary or string
    * column; binary is decoded as UTF-8). */
  def extractText(html: Column): Column = {
    val s = html.cast("string")
    val noScript = regexp_replace(s, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val ent = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** Absolute http(s) outlinks of a page: every `href` attribute value
    * (double-, single-, or un-quoted; any attribute order; tag case
    * ignored) that starts with a scheme — the edge extractor a link
    * graph / crawl frontier / PageRank-style domain-quality pass feeds
    * on. Relative refs are skipped (resolving them needs the base URL —
    * compose with `concat` against the page's own url upstream if
    * wanted). One codegen `regexp_extract_all` per row, no shuffle; the
    * DuckDB oracle replays the identical RE2-safe pattern. */
  def outlinks(html: Column): Column = {
    val s = html.cast("string")
    // one single-group pattern per quote style (engines disagree on
    // non-participating alternation groups: Spark yields "", DuckDB/RE2
    // NULL — separate patterns sidestep that entirely); the unquoted
    // pattern cannot fire inside a quoted value because the char after
    // `=` there is the quote. Links come out grouped by quote style,
    // not document order — a link-graph consumer treats them as a set.
    val styles = Seq(
      "(?i)href\\s*=\\s*\"(https?://[^\"]+)\"",
      "(?i)href\\s*=\\s*'(https?://[^']+)'",
      "(?i)href\\s*=\\s*(https?://[^\\s>\"']+)")
    styles.map(p => regexp_extract_all(s, lit(p), lit(1))).reduce(concat(_, _))
  }
}
