package graft.streaming

import graft.SparkSuite
import graft.queries.Vectors
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** s14's streaming half: per arriving row, ONE broadcast-state
  * expression (ivf_route_cells) yields the top-2 cells WITH their
  * centroids, the residual subtraction and the per-(row, cell) ADC
  * tables derive map-side, and the stream-static join against the
  * persisted residual codes emits exactly the batch gate's distances —
  * the hierarchical serving shape s13's plan-literal form could not
  * reach past a few thousand cells.
  */
class StreamMultiResSpec extends SparkSuite {

  test("two-micro-batch multi-cell residual stream equals the batch gate") {
    val s = spark
    val batch = graft.SparkEntry.queries("s14_stream_multires")(s, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val (cent, _, codes, _, cbRows) = Vectors.residualPqForTesting(s, sf0001)
    val cents = cent.orderBy("cell").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))

    val queries = graft.Tables.embeddings(s, sf0001)
      .filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val src = Files.createTempDirectory("graft-s14-src").toString
    try {
      queries.filter(col("q_id") % 50 === 0).coalesce(1)
        .write.mode("overwrite").parquet(src)
      val stream = s.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "q_id BIGINT, q_emb ARRAY<FLOAT>"))
        .parquet(src)
      val probe = Vectors.rowRouteCellsResidualProbe(
        stream, Vectors.flatRouterState(cents), cbRows, superProbe = 1, k = 2)
      val joined = probe.join(codes, Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), Vectors.adcLookup.as("adist"))
      val q = joined.writeStream
        .format("memory").queryName("s14_test").outputMode("append").start()
      try {
        q.processAllAvailable()
        val afterFirst = s.table("s14_test").count()
        queries.filter(col("q_id") % 50 =!= 0).coalesce(1)
          .write.mode("append").parquet(src)
        q.processAllAvailable()
        val got = s.table("s14_test")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(afterFirst > 0 && got.size > afterFirst.toInt,
          s"micro-batches did not both emit: $afterFirst then ${got.size}")
        assert(got === batch,
          s"stream/batch divergence: stream-only=${(got -- batch).take(5)}, " +
            s"batch-only=${(batch -- got).take(5)}")
      } finally q.stop()
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(src))
    }
  }
}
