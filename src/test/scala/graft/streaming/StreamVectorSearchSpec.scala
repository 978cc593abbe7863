package graft.streaming

import graft.SparkSuite
import graft.queries.Vectors
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** s8's streaming half: the SAME per-row-routed probe of the persisted
  * IVF index must run as a genuine Structured Streaming stream-static
  * join — arriving query vectors fed in two micro-batches — and emit
  * exactly the batch gate's scored candidates. The point under test is
  * the plan-shape property the gate REQUIREs: [[Vectors.rowRoute]] folds
  * the coarse quantizer into one map-only expression, so the identical
  * routing runs in append mode where routeQueries' groupBy/max_by
  * (an aggregate before a join) would be rejected.
  */
class StreamVectorSearchSpec extends SparkSuite {

  test("two-micro-batch query stream against the static IVF index equals the batch gate") {
    val s = spark
    val batch = graft.SparkEntry.queries("s8_stream_vector_search")(s, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val idx = Vectors.ivfIndexForTesting(s, sf0001)
    val cents = Vectors.loadCentroids(s, idx)

    // the arriving queries as a file stream, split into two micro-batches
    val queries = graft.Tables.embeddings(s, sf0001)
      .filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val src = Files.createTempDirectory("graft-s8-src").toString
    try {
      queries.filter(col("q_id") % 50 === 0).coalesce(1)
        .write.mode("overwrite").parquet(src)
      val stream = s.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "q_id BIGINT, q_emb ARRAY<FLOAT>"))
        .parquet(src)
      // same probe plan as the gate: per-row routing -> stream-static
      // join against the cell-partitioned index scan -> exact cosine
      val routed = Vectors.rowRoute(stream, cents)
        .withColumn("q_nrm", expr("sqrt(array_dot(q_emb, q_emb))"))
      val joined = routed
        .join(s.read.parquet(s"$idx/vectors"), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          (expr("array_dot(embedding, q_emb)") / (col("nrm") * col("q_nrm")))
            .as("cos"))
      val q = joined.writeStream
        .format("memory").queryName("s8_test").outputMode("append").start()
      try {
        q.processAllAvailable()
        queries.filter(col("q_id") % 50 =!= 0).coalesce(1)
          .write.mode("append").parquet(src)
        q.processAllAvailable()
        val got = s.table("s8_test")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(got === batch,
          s"stream/batch divergence: stream-only=${(got -- batch).take(5)}, " +
            s"batch-only=${(batch -- got).take(5)}")
      } finally q.stop()
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(src))
    }
  }

  test("hierarchical per-row route (4096 cells) runs append-mode streaming == batch") {
    // the serving tier past HierarchicalRoutingThreshold: rowRouteHier's
    // two broadcast stream-static joins + closed-form argmaxes must be
    // legal in an append-mode plan (no stream-side aggregate) and emit
    // the batch form's exact assignments. 4096 synthetic cells — the
    // scale where the flat-literal rowRoute stops being the answer.
    val s = spark
    val nCells = 4096
    val c = graft.queries.RoutingFixtures.centroids(s, nCells)
    val (supers, kids) = Vectors.hierarchyForRowRoute(c, nCells)
    val q = graft.queries.RoutingFixtures.queries(s, 300, nCells)
    val batch = Vectors.rowRouteHier(q, supers, kids).select("q_id", "cell")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

    val src = Files.createTempDirectory("graft-s8h-src").toString
    try {
      q.filter(col("q_id") % 3 === 0).coalesce(1)
        .write.mode("overwrite").parquet(src)
      val stream = s.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "q_id BIGINT, q_emb ARRAY<DOUBLE>"))
        .parquet(src)
      val routed = Vectors.rowRouteHier(stream, supers, kids)
        .select("q_id", "cell")
      val sq = routed.writeStream
        .format("memory").queryName("s8h_test").outputMode("append").start()
      try {
        sq.processAllAvailable()
        q.filter(col("q_id") % 3 =!= 0).coalesce(1)
          .write.mode("append").parquet(src)
        sq.processAllAvailable()
        val got = s.table("s8h_test")
          .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
        assert(got === batch,
          s"hier stream/batch divergence: stream-only=${(got -- batch).take(5)}, " +
            s"batch-only=${(batch -- got).take(5)}")
      } finally sq.stop()
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(src))
    }
  }
}
