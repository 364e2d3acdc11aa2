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

  /** limit=0 forces the distributed large/small-star rounds; the default
    * exercises the driver union-find fast path. */
  private def run(edges: Seq[(String, String)], limit: Long): Map[String, String] =
    ConnectedComponents.run(edges.toDF("a", "b"), smallGraphLimit = limit)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("random graphs match brute-force union-find (both paths)") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val n = 120
      val edges = Seq.fill(100)((s"v${rnd.nextInt(n)}", s"v${rnd.nextInt(n)}"))
        .filter(e => e._1 != e._2)
      val expect = bruteComponents(edges)
      assert(run(edges, ConnectedComponents.driverEdgeLimit) == expect)
      assert(run(edges, 0L) == expect) // distributed rounds, same answer
    }
  }

  test("long chain converges (O(log n) rounds, not O(n))") {
    val chain = (0 until 200).map(i => (f"c$i%04d", f"c${i + 1}%04d"))
    val got = run(chain, 0L)
    assert(got.values.toSet == Set("c0000"))
    assert(got.size == 201)
    assert(run(chain, ConnectedComponents.driverEdgeLimit) == got)
  }

  test("long vertex ids: driver path matches distributed, numeric ordering") {
    // numeric vs lexicographic matters: 9 < 10 numerically, "10" < "9" as
    // strings — component ids must follow the NATIVE type ordering
    val edges = Seq((10L, 9L), (10L, 100L), (3L, 2L), (2L, 1L))
    def runL(limit: Long): Map[Long, Long] =
      ConnectedComponents.run(edges.toDF("a", "b"), smallGraphLimit = limit)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = runL(ConnectedComponents.driverEdgeLimit)
    assert(fast == Map(9L -> 9L, 10L -> 9L, 100L -> 9L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(runL(0L) == fast)
  }

  test("empty and single-edge graphs (both paths)") {
    for (lim <- Seq(0L, ConnectedComponents.driverEdgeLimit)) {
      assert(run(Nil, lim) == Map.empty)
      assert(run(Seq(("b", "a")), lim) == Map("a" -> "a", "b" -> "a"))
    }
  }
}
