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

  private val dims = 64

  /** Manifold-shaped cell centroids: cells cluster around ~√nCells
    * regions (region center + cell noise) — the structure k-means-derived
    * IVF cells have on real embedding corpora, which is what makes a
    * two-level quantizer work. (Isotropic random centroids are
    * information-theoretically unroutable through √cells probes: every
    * cell is near-orthogonal to every other, and measured agreement
    * collapses to chance.)
    */
  private def centroids(nCells: Int) = {
    val nRegions = math.ceil(math.sqrt(nCells.toDouble)).toInt
    spark.range(nCells)
      .withColumn("region", pmod(abs(hash(col("id") * 31)), lit(nRegions)))
      .select(
        col("id").cast("int").as("cell"),
        expr(s"""transform(sequence(0, ${dims - 1}),
                  d -> cast(hash(region * 64 + d) / 2.147483647E9 * 0.8
                          + hash(id * 64 + d) / 2.147483647E9 * 0.3 as double))""")
          .as("centroid"))
  }

  /** Queries drawn near cell centroids (centroid ·0.9 + 0.2 noise), so
    * each query has an unambiguous best cell most of the time.
    */
  private def queries(nQ: Int, nCells: Int) = {
    val nRegions = math.ceil(math.sqrt(nCells.toDouble)).toInt
    spark.range(nQ)
      .withColumn("home", pmod(abs(hash(col("id") * 13)), lit(nCells)))
      .withColumn("hr", pmod(abs(hash(col("home") * 31)), lit(nRegions)))
      .select(
        col("id").as("q_id"),
        expr(s"""transform(sequence(0, ${dims - 1}),
                  d -> cast((hash(hr * 64 + d) / 2.147483647E9 * 0.8
                           + hash(home * 64 + d) / 2.147483647E9 * 0.3) * 0.9
                          + hash(id * 64 + d) / 2.147483647E9 * 0.2 as double))""")
          .as("q_emb"))
  }

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
