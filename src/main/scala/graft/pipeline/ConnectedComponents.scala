package graft.pipeline

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/**
 * Distributed connected components via alternating large-star / small-star
 * rounds (Kiveris et al., "Connected Components in MapReduce and Beyond",
 * SoCC'14) over plain DataFrames — the batch replacement for the
 * reference's incremental union-find maintained one record at a time in
 * the `dedup` collection (classes/RecordManager.php:1633-1761).
 *
 * Vertices are STRING ids (urls). A 64-bit hash id would be cheaper to
 * shuffle but risks collisions at the 10^12-document design scale
 * (birthday bound), which would silently merge unrelated clusters — so
 * ids stay strings and the component id is the lexicographic minimum
 * member, making output deterministic (the analog of the reference's
 * "adopt the existing cluster id" stability rule,
 * classes/RecordManager.php:1354-1370).
 *
 * Each round is two shuffles (groupBy u + join back); convergence is
 * O(log n) rounds. `localCheckpoint` truncates lineage between rounds —
 * on a real cluster this becomes `checkpoint` to a reliable store / an
 * intermediate Iceberg table (see graft.io.TableIO).
 */
object ConnectedComponents {

  /** Below this many input edges the alternating-rounds machinery (each
    * round: 2 shuffles + a checksum job, ~log n rounds) costs pure driver
    * latency that dwarfs the work — a few-MB edge list is union-found on
    * the driver in one job instead. The DISTRIBUTED path is untouched
    * above the limit.
    *
    * The limit is derived from the ACTUAL driver heap, not a constant:
    * an edge with two long-url string endpoints costs ~500 B of real heap
    * (boxed strings on both sides, tuple, union-find HashMap entries), so
    * the collected graph is allowed ≤10% of `Runtime.maxMemory` and never
    * more than 500k edges (~250 MB worst case on big heaps; ~214k edges
    * under Spark's 1g default driver, keeping the worst case ~100 MB). */
  val driverEdgeLimit: Long = {
    val bytesPerEdge = 500L
    math.min(500000L, Runtime.getRuntime.maxMemory() / 10L / bytesPerEdge)
  }

  /** edges: DataFrame with two string columns (endpoint pairs, undirected).
    * Returns (vertex, component) for every vertex incident to an edge.
    * Vertices that appear in no edge are singletons by definition and are
    * not emitted (the reference likewise keeps no `dedup` doc for
    * singletons, classes/RecordManager.php:1746-1757). */
  def run(edges: DataFrame, maxIter: Int = 64,
          smallGraphLimit: Long = driverEdgeLimit): DataFrame = {
    val spark = edges.sparkSession
    val cols = edges.columns
    require(cols.length == 2, s"edges must have exactly 2 columns, got ${cols.mkString(",")}")

    // canonical orientation (u > v, "points at smaller"), deduplicated
    val canonical0 = edges
      .select(col(cols(0)).as("a"), col(cols(1)).as("b"))
      .where(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct()

    // Small-graph probe: ONE bounded action (round-6) — `limit(L+1)` caps
    // the collected rows at the same heap budget the limit encodes, and a
    // result of ≤ L rows IS the complete canonical edge set, so the
    // former eager-checkpoint + count() + collect() (three sequential
    // driver roundtrips on the clusters stage of EVERY pipeline run, a
    // direct part of the Amdahl serial term that caps measured N→4N
    // scaling) collapses to one job on the common path.
    if (smallGraphLimit > 0) {
      val probe = canonical0.limit(smallGraphLimit.toInt + 1).collect()
      if (probe.length <= smallGraphLimit)
        return driverUnionFind(spark, canonical0.schema.fields(0).dataType, probe)
    }

    // distributed regime: pin the canonical set before iterating (the
    // probe above re-computed the input plan once; that extra pass only
    // exists on graphs past the driver limit, where the iteration cost
    // dwarfs it)
    var e = canonical0.localCheckpoint(true)

    var converged = false
    var iter = 0
    var sig = checksum(e)
    while (!converged && iter < maxIter) {
      // large-star: for every node u, connect all strictly-larger
      // neighbors to min(N(u) ∪ {u}). Duplicate emissions are harmless
      // (absorbed by small-star's min + final distinct), so no extra
      // dedup shuffle here.
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u")
        .agg(F.min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = sym.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        // consumed twice below (small-star min agg + join back); unpinned,
        // the large-star join re-ran once per consumer every round —
        // planner exchange reuse is not guaranteed to deduplicate the
        // copies (measured zero ReusedExchange on identical verify-stage
        // subtrees). Lazy pin, edge-scale per round — the same magnitude
        // the small-star checkpoint below already materializes.
        .localCheckpoint(false)

      // small-star: for every node u, connect u and its smaller
      // neighbors to the minimum of them
      val minsS = large.groupBy("u").agg(F.min("v").as("m"))
      val small = large.join(minsS, "u")
        .select(col("v").as("n"), col("m"), col("u"))
        .select(explode(array(struct(col("n"), col("m")), struct(col("u").as("n"), col("m")))).as("p"))
        .select(col("p.n").as("a"), col("p.m").as("b"))
        .where(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
        .distinct()
        // localCheckpoint (NOT cache): truncates the LOGICAL plan to an
        // RDD leaf. The iteration's plan references its input ~12×, so
        // without truncation the tree grows ~12^k and even building its
        // explain string hangs the driver. On a real cluster this becomes
        // reliable checkpoint()/an intermediate Iceberg table.
        .localCheckpoint(true)

      val newSig = checksum(small)
      converged = newSig == sig
      sig = newSig
      e = small
      iter += 1
    }

    // converged edge set is a star forest: member -> root
    val members = e.select(col("u").as("vertex"), col("v").as("component"))
    val roots = e.select(col("v")).distinct()
      .join(e.select(col("u")).distinct(), col("v") === col("u"), "left_anti")
      .select(col("v").as("vertex"), col("v").as("component"))
    members.union(roots)
  }

  /** Small-graph fast path: collect the (bounded) edge list and union-find
    * with path compression on the driver. Component id = minimum member
    * under the vertex type's NATIVE ordering — identical semantics to the
    * distributed rounds' least/greatest (asserted equivalent in
    * ConnectedComponentsSpec). Type-generic because callers pass string
    * urls (text pipeline) or long vec_ids (embedding pipeline). */
  private def driverUnionFind(spark: org.apache.spark.sql.SparkSession,
                              dt: org.apache.spark.sql.types.DataType,
                              collected: Array[org.apache.spark.sql.Row]): DataFrame = {
    import org.apache.spark.sql.types._
    val ord: Ordering[Any] = (dt match {
      case StringType  => Ordering.String
      case LongType    => Ordering.Long
      case IntegerType => Ordering.Int
      case ShortType   => Ordering.Short
      case DoubleType  => Ordering.Double.TotalOrdering
      case other => sys.error(s"unsupported CC vertex type: $other")
    }).asInstanceOf[Ordering[Any]]
    val pairs = collected.map(r => (r.get(0), r.get(1)))
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    // union by minimum root: the min member always wins, so every find()
    // ends at the component's smallest vertex
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ord.lt(ra, rb)) parent(rb) = ra else parent(ra) = rb }
    }
    val verts = pairs.iterator.flatMap(p => Iterator(p._1, p._2)).toSet
    val rows = verts.toSeq.sorted(ord)
      .map(v => org.apache.spark.sql.Row(v, find(v)))
    val schema = StructType(Seq(
      StructField("vertex", dt, nullable = false),
      StructField("component", dt, nullable = false)))
    // re-parallelize with explicit slices (NOT a LocalRelation): a
    // createDataFrame(list) result re-enters the cluster as one
    // LocalRelation serialized whole into EVERY downstream task (~4 MB
    // tasks at the edge limit — Spark's large-task warning); ~8k rows per
    // slice keeps each task's payload well under the 1000 KiB guidance.
    val slices = math.max(1, math.min(1024, rows.size / 8000 + 1))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, slices), schema)
  }

  private def checksum(e: DataFrame): (Long, Long) = {
    // XOR-fold (overflow-free under ANSI mode) of the edge hashes
    val r = e.agg(count(lit(1)).as("c"),
      coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("h")).head()
    (r.getLong(0), r.getLong(1))
  }
}
