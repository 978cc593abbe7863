package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The broadcast-state top-k cell router (ivf_route_cells — the routing
  * form residual serving needs past plan-literal scale, VERDICT r18
  * missing #3), pinned three ways at 4096 cells:
  *
  *  1. FLAT-STATE EXACTNESS — over the degenerate one-super state the
  *     expression's top-k cells are bit-identical to the batch
  *     [[Vectors.multiRoute]] (the property that keeps the v16/s14
  *     DuckDB oracles exact at gate scale);
  *  2. HIERARCHICAL PARITY — over the real two-level state with k=1 it
  *     routes exactly like the batch hierarchical router
  *     ([[Vectors.rowRouteHier]]): same buildHierarchy state, same
  *     (dp desc, id asc) argmax algebra at both levels;
  *  3. CENTROID FIDELITY — the emitted centroid is the routed cell's
  *     own quantizer centroid, byte-for-byte (the value the residual
  *     subtraction consumes).
  */
class RouteCellsSpec extends SparkSuite {

  private val nCells = 4096
  private lazy val cents = RoutingFixtures.centroids(spark, nCells)
    .orderBy("cell").collect()
    .map(r => (r.getInt(0), r.getSeq[Double](1)))
  private def queries = RoutingFixtures.queries(spark, 512, nCells)

  test("flat state top-2 cells == batch multiRoute at 4096 cells") {
    val viaExpr = Vectors.rowRouteCells(
        queries, Vectors.flatRouterState(cents), superProbe = 1, k = 2)
      .select("q_id", "cell")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val viaBatch = Vectors.multiRoute(
        queries, RoutingFixtures.centroids(spark, nCells), nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(viaExpr.size == 1024 && viaExpr == viaBatch,
      s"flat-state route diverged: expr-only=${(viaExpr -- viaBatch).take(5)}" +
        s" batch-only=${(viaBatch -- viaExpr).take(5)}")
  }

  test("hierarchical state, k=1 == batch hierarchical router at 4096 cells") {
    val cdf = RoutingFixtures.centroids(spark, nCells)
    val viaExpr = Vectors.rowRouteCells(
        queries, Vectors.hierRouterState(cdf, nCells), superProbe = 2, k = 1)
      .select("q_id", "cell")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val (supers, kids) = Vectors.hierarchyForRowRoute(cdf, nCells)
    val viaBatch = Vectors.rowRouteHier(queries, supers, kids, nprobe = 2)
      .select("q_id", "cell")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(viaExpr == viaBatch,
      s"hierarchical route diverged: expr-only=${(viaExpr -- viaBatch).take(5)}" +
        s" batch-only=${(viaBatch -- viaExpr).take(5)}")
  }

  test("hierarchical state, k=2 == driver reference at 4096 cells (the v16 shape)") {
    // v16/s14 route with k = nprobe over the THRESHOLDED state (r21);
    // past the threshold that is the two-level hierarchy, so pin the
    // multi-cell hierarchical route against an independent driver-side
    // reference: top-2 supers by (dp desc, super asc), then top-2 cells
    // by (dp desc, cell asc) among those supers' kids.
    val cdf = RoutingFixtures.centroids(spark, nCells)
    val (supers, kidsDf) = Vectors.hierarchyForRowRoute(cdf, nCells)
    val kids: Map[Int, Seq[(Int, Seq[Double])]] = kidsDf.collect().map { r =>
      r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(k => (k.getInt(0), k.getSeq[Double](1)))
    }.toMap
    val qs = queries.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    val want = qs.flatMap { case (qid, q) =>
      val topSupers = supers
        .map { case (sid, sc) => (sid, dot(q, sc)) }
        .sortBy { case (sid, dp) => (-dp, sid) }.take(2).map(_._1)
      topSupers.flatMap(kids(_))
        .map { case (cell, cc) => (cell, dot(q, cc)) }
        .sortBy { case (cell, dp) => (-dp, cell) }.take(2)
        .map { case (cell, _) => (qid, cell) }
    }.toSet
    val got = Vectors.rowRouteCells(
        queries, Vectors.hierRouterState(cdf, nCells), superProbe = 2, k = 2)
      .select("q_id", "cell")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == want,
      s"hier k=2 route diverged: expr-only=${(got -- want).take(5)}" +
        s" ref-only=${(want -- got).take(5)}")
  }

  test("emitted centroids are the routed cells' quantizer centroids") {
    val cdf = RoutingFixtures.centroids(spark, nCells)
    val routed = Vectors.rowRouteCells(
      queries.limit(64), Vectors.hierRouterState(cdf, nCells),
      superProbe = 2, k = 2)
    val mismatches = routed.join(cdf, "cell")
      .filter(not(col("rcent") === col("centroid"))).count()
    assert(mismatches == 0, s"$mismatches emitted centroids drifted")
    // and k=2 emits exactly two DISTINCT cells per query
    val perQ = routed.groupBy("q_id")
      .agg(countDistinct("cell").as("n")).filter(col("n") =!= 2).count()
    assert(perQ == 0, "k=2 route did not emit two distinct cells per query")
  }
}
