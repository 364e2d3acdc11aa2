package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.SparkTestSession

/** Large-star/small-star CC vs a brute-force union-find on random graphs,
  * plus the pathological chain case (SURVEY.md §7.4 risk 5). */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bruteComponents(edges: Seq[(String, String)]): Map[String, String] = {
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // path-compress fully, then map every vertex to the min member of its
    // component (canonical id)
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = verts.groupBy(find)
    byRoot.values.flatMap { vs => val m = vs.min; vs.map(_ -> m) }.toMap
  }

  private def run(edges: Seq[(String, String)]): Map[String, String] =
    ConnectedComponents.run(edges.toDF("a", "b"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("random graphs match brute-force union-find") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val n = 120
      val edges = Seq.fill(100)((s"v${rnd.nextInt(n)}", s"v${rnd.nextInt(n)}"))
        .filter(e => e._1 != e._2)
      assert(run(edges) == bruteComponents(edges))
    }
  }

  test("long chain converges (O(log n) rounds, not O(n))") {
    val chain = (0 until 200).map(i => (f"c$i%04d", f"c${i + 1}%04d"))
    val got = run(chain)
    assert(got.values.toSet == Set("c0000"))
    assert(got.size == 201)
  }

  test("empty and single-edge graphs") {
    assert(run(Nil) == Map.empty)
    assert(run(Seq(("b", "a"))) == Map("a" -> "a", "b" -> "a"))
  }
}
