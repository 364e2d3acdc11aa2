package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class ProjectionDslSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val df = Seq(
    ("https://host7.example.com/doc/42", "The Quick brown FOX 1987", "en")
  ).toDF("url", "text", "lang")

  test("spec parses to columns: identity, fns, args, aliases") {
    val out = ProjectionDsl.project(df,
      "u=url; host=url:host; low=text:lower; up=lang:upper; uc=lang:ucfirst; " +
        "yr=text:year; first5=text:substr:5; n=text:len; norm=text:normalize")
      .head()
    assert(out.getAs[String]("u") == "https://host7.example.com/doc/42")
    assert(out.getAs[String]("host") == "host7.example.com")
    assert(out.getAs[String]("low") == "the quick brown fox 1987")
    assert(out.getAs[String]("up") == "EN")
    assert(out.getAs[String]("uc") == "En")
    assert(out.getAs[String]("yr") == "1987")
    assert(out.getAs[String]("first5") == "The Q")
    assert(out.getAs[Long]("n") == 24L)
    assert(out.getAs[String]("norm") == "thequickbrownfox1987")
  }

  test("unknown fn fails fast at parse time") {
    intercept[IllegalArgumentException] {
      ProjectionDsl.parse("x=url:bogus")
    }
  }
}
