package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** ExactSubstr pinned against a brute-force single-node reference:
  * every k-gram counted by its STRING (no hashing), coverage and
  * interval merge recomputed directly. */
class ExactSubstrSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def refSpans(docs: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty).toVector }
    val counts = scala.collection.mutable.Map[String, Int]()
    for ((_, ts) <- toks; i <- 0 to ts.length - k)
      counts(ts.slice(i, i + k).mkString(" ")) =
        counts.getOrElse(ts.slice(i, i + k).mkString(" "), 0) + 1
    val out = Set.newBuilder[(Long, Long, Long)]
    for ((id, ts) <- toks) {
      val covered = Array.fill(ts.length)(false)
      for (i <- 0 to ts.length - k
           if counts(ts.slice(i, i + k).mkString(" ")) >= 2;
           j <- i until i + k) covered(j) = true
      var i = 0
      while (i < ts.length) {
        if (covered(i)) {
          val s = i
          while (i < ts.length && covered(i)) i += 1
          out += ((id, s.toLong, (i - 1).toLong))
        } else i += 1
      }
    }
    out.result()
  }

  // shared 5-token run "p q r s t" planted in docs 1 and 2; doc 3 is an
  // exact copy of doc 1; doc 4 shares nothing; doc 5 repeats a run
  // WITHIN itself
  private val corpus = Seq(
    (1L, "a b c p q r s t d e f"),
    (2L, "x y p q r s t z w v u"),
    (3L, "a b c p q r s t d e f"),
    (4L, "m n o k l h g j i e d"),
    (5L, "r1 r2 r3 q1 q2 r1 r2 r3 q3 q4"))

  private def sparkSpans(k: Int): Set[(Long, Long, Long)] =
    ExactSubstr.duplicatedSpans(corpus.toDF("doc_id", "text"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("duplicatedSpans matches the brute-force reference at several k") {
    for (k <- Seq(2, 3, 5)) {
      assert(sparkSpans(k) == refSpans(corpus, k), s"k=$k")
    }
  }

  test("k=5: the planted cross-doc run and the exact copy are found; doc 4 clean") {
    val spans = sparkSpans(5)
    // docs 1 and 3 are identical 11-token docs: every 5-gram duplicated
    assert(spans.contains((1L, 0L, 10L)) && spans.contains((3L, 0L, 10L)))
    // doc 2's shared run is exactly "p q r s t" at positions 2..6
    assert(spans.contains((2L, 2L, 6L)))
    assert(!spans.exists(_._1 == 4L))
  }

  test("within-doc repetition counts toward the >=2 threshold") {
    // doc 5: "r1 r2 r3" appears twice within the doc (pos 0 and 5)
    val spans = sparkSpans(3)
    assert(spans.exists { case (id, s, e) => id == 5L && s == 0L && e == 2L })
    assert(spans.exists { case (id, s, e) => id == 5L && s == 5L && e == 7L })
  }

  test("removeDuplicatedSpans drops covered tokens, keeps the rest in order") {
    val got = ExactSubstr.removeDuplicatedSpans(corpus.toDF("doc_id", "text"), 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "")                       // fully duplicated
    assert(got(2L) == "x y z w v u")            // run at 2..6 removed
    assert(got(4L) == "m n o k l h g j i e d")  // untouched
    // short docs (< k tokens) pass through under the space convention
    val short = ExactSubstr.removeDuplicatedSpans(
      Seq((9L, "just three tokens")).toDF("doc_id", "text"), 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(short(9L) == "just three tokens")
  }

  test("removeDuplicatedSpans is linear on a pathological alternating-dup doc") {
    // 10k tokens alternating a duplicated k-gram with a unique separator:
    // thousands of merged spans in ONE doc — the shape that degraded the
    // former per-token `exists(spans, …)` probe quadratically. The doc is
    // "D D D u<i> D D D u<i+1> ..." where the 3-token run "D D D" is
    // corpus-duplicated (appears in every block) and each u<i> is unique.
    val block = "dup dup dup"
    val n = 2500 // 2500 blocks × 4 tokens = 10k tokens
    val text = (0 until n).map(i => s"$block u$i").mkString(" ")
    val expect = (0 until n).map(i => s"u$i").mkString(" ")
    val t0 = System.nanoTime()
    val got = ExactSubstr.removeDuplicatedSpans(
      Seq((1L, text)).toDF("doc_id", "text"), 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(got(1L) == expect)
    // quadratic probing measured minutes here; linear removal is seconds
    assert(secs < 60.0, f"pathological doc took $secs%.1f s")
  }

  test("span assembly stays windowed per doc (no corpus-global sort)") {
    val plan = ExactSubstr.duplicatedSpans(corpus.toDF("doc_id", "text"), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"unbounded join in:\n$plan")
  }
}
