package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** HTML text-extraction contract: tag strip, script/style content
  * removal, entity unescape order, whitespace normalization, binary
  * input. */
class HtmlOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ext(s: String): String =
    Seq(s).toDF("html").select(HtmlOps.extractText(col("html")))
      .head().getString(0)

  test("strips tags and keeps word boundaries") {
    assert(ext("<html><body><p>Hello world</p></body></html>") == "Hello world")
    assert(ext("a<br>b") == "a b")
    assert(ext("<div class=\"x\" data-y='1'>v</div>") == "v")
  }

  test("drops script and style CONTENT, not just their tags") {
    assert(ext("<script>var x = '<secret>';</script>after") == "after")
    assert(ext("<SCRIPT TYPE=\"text/javascript\">\nmultiline();\n</SCRIPT>ok") == "ok")
    assert(ext("<style>p { color: red }</style>body text") == "body text")
    // two script blocks, lazy matching keeps the text between them
    assert(ext("<script>a()</script>mid<script>b()</script>") == "mid")
  }

  test("entity unescape order: amp strictly last") {
    assert(ext("1 &lt; 2 &gt; 0 &amp; true") == "1 < 2 > 0 & true")
    assert(ext("say &quot;hi&quot; it&#39;s fine") == "say \"hi\" it's fine")
    // &amp;lt; is the LITERAL four chars "&lt;", never double-unescaped
    assert(ext("escaped: &amp;lt;tag&amp;gt;") == "escaped: &lt;tag&gt;")
    assert(ext("non&nbsp;breaking") == "non breaking")
  }

  test("collapses whitespace and trims") {
    assert(ext("  <p> a\n\n b\t c </p> ") == "a b c")
  }

  test("accepts the binary html column shape") {
    val got = Seq("<html><body>payload text</body></html>")
      .toDF("h").select(HtmlOps.extractText(col("h").cast("binary")))
      .head().getString(0)
    assert(got == "payload text")
  }

  private def links(s: String): Seq[String] =
    Seq(s).toDF("html").select(HtmlOps.outlinks(col("html")))
      .head().getSeq[String](0)

  test("outlinks: all three quote styles, any case, whitespace around =") {
    val html = """<a href="https://a.com/x">1</a> <a HREF='http://b.org/y?q=1'>2</a>
                 |<A href = https://c.net/z>3</A>""".stripMargin
    assert(links(html).toSet ==
      Set("https://a.com/x", "http://b.org/y?q=1", "https://c.net/z"))
  }

  test("outlinks: relative refs and non-href urls are skipped") {
    val html = """<a href="/rel/path">r</a> <img src="https://img.com/i.png">
                 |<a href="https://keep.me/p">k</a>""".stripMargin
    assert(links(html) == Seq("https://keep.me/p"))
    assert(links("<p>no links at all</p>") == Seq())
  }

  test("outlinks: unquoted value stops at whitespace or tag end; binary input") {
    val got = Seq("<a href=https://u.io/a rel=nofollow>x</a>")
      .toDF("h").select(HtmlOps.outlinks(col("h").cast("binary")))
      .head().getSeq[String](0)
    assert(got == Seq("https://u.io/a"))
  }
}
