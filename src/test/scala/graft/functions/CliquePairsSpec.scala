package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The fused SortedCliquePairs expression must reproduce the composed
  * pairExpand(array_sort(zip_with(ids, tags, struct))) chain BIT-FOR-BIT
  * — the candidate stage's clique pairs (and therefore every downstream
  * verified pair and cluster) derive from it. The reference here IS the
  * old chain, rebuilt verbatim from the shipping builtins. */
class CliquePairsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The former composed chain, verbatim (DedupPipeline rounds 1–6). */
  private def legacy(ids: Column, tags: Column): Column = {
    def pairExpand(m: Column): Column =
      flatten(transform(m, (x, i) =>
        transform(slice(m, i + lit(2), size(m)), y => struct(x.as("a"), y.as("b")))))
    pairExpand(array_sort(zip_with(ids, tags,
      (u, t) => struct(u.as("u"), t.as("t")))))
  }

  private def explodeBoth(rows: Seq[(Seq[Long], Seq[Long])]) = {
    val df = rows.toDF("ids", "tags")
    def flat(c: Column) = df
      .select(posexplode(c).as(Seq("i", "p")))
      .select(col("i"), col("p.a.u"), col("p.a.t"), col("p.b.u"), col("p.b.t"))
      .collect().map(_.toString).toSeq
    (flat(cliquepairs.sortedCliquePairs(col("ids"), col("tags"))),
      flat(legacy(col("ids"), col("tags"))))
  }

  test("bit-equivalent to the composed sort+zip+expand chain, position included") {
    val rows = Seq(
      (Seq.empty[Long], Seq.empty[Long]),                       // no members
      (Seq(7L), Seq(0L)),                                       // singleton
      (Seq(5L, 3L), Seq(10L, 20L)),                             // unsorted input
      (Seq(9L, 1L, 4L, 1L), Seq(0L, 2L, 0L, 1L)),               // duplicate u, tie on t order
      (Seq(-3L, Long.MinValue, Long.MaxValue, 0L), Seq(1L, 2L, 3L, 4L)),
      (Seq.tabulate(50)(i => (37L * i) % 17L), Seq.tabulate(50)(i => i.toLong)))
    val (fused, composed) = explodeBoth(rows)
    assert(fused == composed)
    assert(fused.nonEmpty)
  }

  test("null array yields null (matches the null-intolerant composed form)") {
    val df = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]])).toDF("ids", "tags")
    val got = df.select(
      cliquepairs.sortedCliquePairs(col("ids"), col("tags")).as("g"),
      legacy(col("ids"), col("tags")).as("l")).head()
    assert(got.isNullAt(0) && got.isNullAt(1))
  }

  test("misaligned lengths fail loudly instead of zip_with's silent null-pad") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(1L))).toDF("ids", "tags")
    val e = intercept[Exception] {
      df.select(cliquepairs.sortedCliquePairs(col("ids"), col("tags"))).collect()
    }
    assert(e.getMessage != null)
  }
}
