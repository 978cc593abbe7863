package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Hierarchical IVF routing (the coarse quantizer over cells): above the
  * threshold each query scores ~√cells super-centroids then one super's
  * cells instead of every cell. Routing quality is the contract — on
  * clustered (GenScale-shaped) data the two-level argmax must agree with
  * the flat argmax for nearly every query, and the misses must land on a
  * near-equivalent cell, not an arbitrary one.
  */
class RoutingHierarchySpec extends SparkSuite {

  /** Manifold-shaped centroids + clustered queries (see
    * [[RoutingFixtures]] — shared with the streaming route specs).
    * Isotropic random centroids are information-theoretically
    * unroutable through √cells probes; the fixtures model the clustered
    * case that makes a two-level quantizer work.
    */
  private def centroids(nCells: Int) = RoutingFixtures.centroids(spark, nCells)
  private def queries(nQ: Int, nCells: Int) =
    RoutingFixtures.queries(spark, nQ, nCells)

  test("below the threshold the flat oracle-tiebreak path runs") {
    val c = centroids(100)
    val q = queries(500, 100)
    val routed = Vectors.routeQueries(q, c, nCells = 100)
    // exact flat argmax replicated inline
    val flat = q.crossJoin(broadcast(c))
      .select(col("q_id"), col("cell"),
        expr("array_dot(q_emb, centroid)").as("dp"))
      .groupBy("q_id")
      .agg(max_by(col("cell"), struct(col("dp"), -col("cell"))).as("cell"))
    assert(routed.collect().map(r => (r.getLong(0), r.getInt(1))).toSet ===
      flat.collect().map(r => (r.getLong(0), r.getInt(1))).toSet)
  }

  test("4096 cells: hierarchical routing agrees with flat on clustered queries") {
    val nCells = 4096
    val c = centroids(nCells).persist()
    val q = queries(2000, nCells).persist()
    try {
      assert(nCells > Vectors.HierarchicalRoutingThreshold)
      val hier = Vectors.routeQueries(q, c, nCells)
        .withColumnRenamed("cell", "cell_h")
      val flat = Vectors.routeQueries(q, c, nCells = 100) // force flat branch
        .withColumnRenamed("cell", "cell_f")
      val both = hier.join(flat, "q_id")
        .join(q, "q_id")
        .join(c.select(col("cell").as("cell_h"), col("centroid").as("ch")), Seq("cell_h"))
        .join(c.select(col("cell").as("cell_f"), col("centroid").as("cf")), Seq("cell_f"))
        .select(col("q_id"), col("cell_h"), col("cell_f"),
          expr("array_dot(q_emb, ch)").as("dph"),
          expr("array_dot(q_emb, cf)").as("dpf"))
        .collect()
      val n = both.length
      assert(n === 2000)
      // nprobe=2 Voronoi routing on manifold-shaped cells: ~88% exact
      // agreement measured; the contract is ≥85% exact plus the
      // near-equivalence bound below on the misses
      val agree = both.count(r => r.getInt(1) == r.getInt(2))
      assert(agree >= (n * 0.85).toInt,
        s"hierarchical agreed on $agree/$n routed queries")
      // a miss must land on a near-equivalent cell (≥90% of the flat dot)
      val badMisses = both.filter(r => r.getInt(1) != r.getInt(2) &&
        r.getDouble(3) < 0.9 * r.getDouble(4))
      assert(badMisses.length <= n / 50,
        s"${badMisses.length} routed cells fall far below the flat argmax")
    } finally { c.unpersist(); q.unpersist(); () }
  }

  test("4096 cells: per-row two-level route == batch hierarchical route, stream side map-only") {
    // the streaming serving tier past HierarchicalRoutingThreshold: the
    // per-row closed-form route (super-centroid literals + broadcast
    // children, rowRouteHier) must assign every query the SAME cell as
    // the batch hierarchical route — same buildHierarchy state, same
    // nprobe=2 probe set, same (dp, -id) tiebreaks at both levels — and
    // its plan must shuffle nothing outside the static broadcast sides
    val nCells = 4096
    val c = centroids(nCells).persist()
    val q = queries(2000, nCells).persist()
    try {
      val batch = Vectors.routeQueries(q, c, nCells).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toMap
      val (supers, kids) = Vectors.hierarchyForRowRoute(c, nCells)
      assert(supers.length == math.ceil(math.sqrt(nCells.toDouble)).toInt)
      val perRowDf = Vectors.rowRouteHier(q, supers, kids).select("q_id", "cell")
      assert(graft.sources.Bucketed.streamSideShuffles(perRowDf) == 0,
        s"stream side shuffled:\n${perRowDf.queryExecution.executedPlan}")
      val perRow = perRowDf.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      assert(perRow.size === 2000 && batch.size === 2000)
      val diverged = perRow.collect {
        case (qid, cell) if batch(qid) != cell => (qid, batch(qid), cell)
      }
      assert(diverged.isEmpty,
        s"${diverged.size} queries routed differently (q_id, batch, perRow): " +
          s"${diverged.take(5)}")
    } finally { c.unpersist(); q.unpersist(); () }
  }

  test("nprobe=2 boundary: a better cell inside the runner-up super wins the final argmax") {
    // hand-built two-super quantizer, dims=2 for exactness by inspection:
    // the query's super argmax picks s0, but the best CELL (21) lives in
    // s1 — only the second-probe path can route it there
    val s = spark
    import s.implicits._
    val supers = Array((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
    val kids = Seq(
      (0, Seq((10, Seq(1.0, 0.0)))),
      (1, Seq((20, Seq(0.0, 1.0)), (21, Seq(2.0, 2.0)))))
      .toDF("super", "kids")
      .select(col("super"), expr(
        "transform(kids, k -> struct(k._1 AS cell, k._2 AS centroid)) AS kids"))
    val q = Seq((1L, Seq(1.0, 0.9))).toDF("q_id", "q_emb")
    val routed = Vectors.rowRouteHier(q, supers, kids).select("q_id", "cell")
    assert(routed.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((1L, 21)))

    // tiebreak at the cell stage: equal dp across supers -> smallest cell
    val kidsTie = Seq(
      (0, Seq((5, Seq(2.0, 2.0)))),
      (1, Seq((20, Seq(0.0, 1.0)), (21, Seq(2.0, 2.0)))))
      .toDF("super", "kids")
      .select(col("super"), expr(
        "transform(kids, k -> struct(k._1 AS cell, k._2 AS centroid)) AS kids"))
    val tied = Vectors.rowRouteHier(q, supers, kidsTie).select("q_id", "cell")
    assert(tied.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((1L, 5)), "equal-dp tie must break to the smaller cell id")
  }

  test("nprobe parameterized: tier parity at 4, monotone recall, nprobe=1 boundary") {
    val nCells = 4096
    val c = centroids(nCells).persist()
    val q = queries(2000, nCells).persist()
    try {
      // the two tiers must agree at EVERY shared nprobe, not just the
      // default — same buildHierarchy state, same generalized top-k
      // insertion algebra vs the batch route's sequential max_by passes
      for (np <- Seq(1, 4)) {
        val batch = Vectors.routeQueries(q, c, nCells, nprobe = np).collect()
          .map(r => (r.getLong(0), r.getInt(1))).toMap
        val (supers, kids) = Vectors.hierarchyForRowRoute(c, nCells)
        val perRow = Vectors.rowRouteHier(q, supers, kids, np)
          .select("q_id", "cell").collect()
          .map(r => (r.getLong(0), r.getInt(1))).toMap
        val diverged = perRow.collect {
          case (qid, cell) if batch(qid) != cell => (qid, batch(qid), cell)
        }
        assert(diverged.isEmpty,
          s"nprobe=$np: ${diverged.size} queries routed differently " +
            s"(q_id, batch, perRow): ${diverged.take(5)}")
      }
      // deeper probing must not LOSE agreement with the flat argmax —
      // nprobe=k's probe set contains nprobe=j's for j<k, and the final
      // cell argmax over a superset can only match flat more often
      val flat = Vectors.routeQueries(q, c, nCells = 100).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toMap
      val (supers, kids) = Vectors.hierarchyForRowRoute(c, nCells)
      val agreeAt = Seq(1, 2, 4, 8).map { np =>
        val routed = Vectors.rowRouteHier(q, supers, kids, np)
          .select("q_id", "cell").collect()
        np -> routed.count(r => flat(r.getLong(0)) == r.getInt(1))
      }
      agreeAt.sliding(2).foreach { case Seq((n1, a1), (n2, a2)) =>
        assert(a2 >= a1,
          s"flat agreement fell from $a1 (nprobe=$n1) to $a2 (nprobe=$n2)")
      }
      assert(agreeAt.last._2 > agreeAt.head._2,
        s"the recall knob is inert on clustered queries: $agreeAt")
    } finally { c.unpersist(); q.unpersist(); () }
  }

  test("hierarchical plan: every cartesian is a small-side broadcast") {
    val nCells = 4096
    val routed = Vectors.routeQueries(queries(100, nCells), centroids(nCells), nCells)
    val physical = routed.queryExecution.executedPlan.toString
    // cross joins exist only against ≤√cells frames (seed assignment +
    // super scoring) and all of them broadcast — a CartesianProduct
    // would mean the full cell table met the queries without a key
    assert(!physical.contains("CartesianProduct"),
      s"non-broadcast cartesian in the routing plan:\n$physical")
    // the full cell table reaches the queries through a keyed join
    assert(physical.contains("super"), "cell stage must join on super")
  }
}
