package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Non-finite inputs must route IDENTICALLY across the three routing
  * tiers (r16 ADVICE): the batch hierarchical route's super top-k used
  * a bare negated score, ranking NaN dots WORST (NaN sorts greatest
  * ascending), while the flat max_by and the row router's
  * SQLOrderingUtil ordering rank NaN BEST — so a NaN-bearing embedding
  * broke the claimed batch/row bit-parity. The fix maps NaN → -∞ on the
  * negated super score; this spec pins batch == row at several nprobe
  * on a query set that mixes finite and all-NaN embeddings.
  */
class RoutingNanParitySpec extends SparkSuite {

  test("batch hierarchical route == row route on NaN-bearing queries") {
    val nCells = 4096
    val c = RoutingFixtures.centroids(spark, nCells).persist()
    val base = RoutingFixtures.queries(spark, 200, nCells)
    // poison every 10th query with an all-NaN embedding (the realistic
    // corruption: a 0/0 normalization or bad upstream decode propagates
    // NaN through every dot against it)
    val q = base.select(col("q_id"),
      when(col("q_id") % 10 === 0,
        expr("transform(q_emb, x -> CAST('NaN' AS DOUBLE))"))
        .otherwise(col("q_emb")).as("q_emb"))
      .persist()
    try {
      assert(q.filter(expr("isnan(q_emb[0])")).count() > 0)
      val (supers, kids) = Vectors.hierarchyForRowRoute(c, nCells)
      for (np <- Seq(1, 2, 4)) {
        val batch = Vectors.routeQueries(q, c, nCells, nprobe = np)
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        val row = Vectors.rowRouteHier(q, supers, kids, np)
          .select("q_id", "cell")
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(batch == row,
          s"nprobe=$np: tiers disagree on " +
            s"${batch.keySet.filter(k => batch(k) != row(k)).take(5)}")
      }
      // NaN queries themselves must agree tier-to-tier (not merely be
      // present): both tiers rank NaN best, ties to the smallest ids
      val nanIds = q.filter(expr("isnan(q_emb[0])"))
        .select("q_id").collect().map(_.getLong(0)).toSet
      val batch2 = Vectors.routeQueries(q, c, nCells, nprobe = 2)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val row2 = Vectors.rowRouteHier(q, supers, kids, 2)
        .select("q_id", "cell")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      nanIds.foreach { id =>
        assert(batch2(id) == row2(id),
          s"NaN query $id: batch ${batch2(id)} != row ${row2(id)}")
      }
    } finally { c.unpersist(); q.unpersist(); () }
  }
}
