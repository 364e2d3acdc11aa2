package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Record-driver seam: every source format normalizes to the one pages
  * relation and the pipeline runs over it unchanged. */
class PageSourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("json-lines and csv readers normalize to the pages shape; pipeline runs over them") {
    val dir = java.nio.file.Files.createTempDirectory("graft-src")
    val json = dir.resolve("pages.jsonl")
    java.nio.file.Files.writeString(json,
      """{"url":"https://a.example.com/1","warc_ts":"2024-01-01T00:00:00Z","html":"<html><body>x y z</body></html>","text":"x y z words here now","lang":"en"}
        |{"url":"https://b.example.com/2","warc_ts":"2024-01-02T00:00:00Z","html":"<html><body>x y z</body></html>","text":"x y z words here now","lang":"en"}
        |""".stripMargin)
    val csv = dir.resolve("pages.csv")
    java.nio.file.Files.writeString(csv,
      """url,warc_ts,text,lang
        |https://c.example.com/3,2024-01-03T00:00:00,other words entirely different,de
        |""".stripMargin)

    val fromJson = PageSources.fromJsonLines(spark, json.toString)
    val fromCsv = PageSources.fromCsv(spark, csv.toString)
    for (df <- Seq(fromJson, fromCsv)) {
      assert(df.columns.toSet == Set("url", "warc_ts", "html", "text", "lang", "source"))
      assert(df.schema("warc_ts").dataType.typeName == "timestamp")
      assert(df.schema("html").dataType.typeName == "binary")
    }
    assert(fromJson.count() == 2 && fromCsv.count() == 1)
    // hostname-derived source (url carries the reference's source_id role)
    assert(fromCsv.select("source").head().getString(0) == "c.example.com")

    // the pipeline is format-agnostic: exact dup across the union clusters
    val r = graft.pipeline.DedupPipeline.run(spark, fromJson.unionByName(fromCsv))
    val clusters = r.clusters.collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(clusters.get("https://a.example.com/1").isDefined)
    assert(clusters("https://a.example.com/1") == clusters("https://b.example.com/2"))
    assert(!clusters.contains("https://c.example.com/3"))
  }
}
