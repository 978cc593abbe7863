package graft.streaming

import graft.SparkSuite
import graft.queries.Vectors
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** s13's streaming half: per-row route → per-row RESIDUAL ADC table
  * (subtract the routed cell's centroid, then the closed-form 512-entry
  * table) probing the static residual code table must run as a genuine
  * Structured Streaming stream-static join and emit exactly the batch
  * gate's distances. The residual subtraction rides plan literals like
  * the router itself, so the whole derivation stays map-only /
  * append-legal — the property the in-gate REQUIRE pins.
  */
class StreamResidualAdcSpec extends SparkSuite {

  test("two-micro-batch query stream against the residual codes equals the batch gate") {
    val s = spark
    val batch = graft.SparkEntry.queries("s13_stream_ivfpq_residual")(s, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val (cent, _, codes, _, cbRows) = Vectors.residualPqForTesting(s, sf0001)
    val cents = cent.orderBy("cell").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))

    val queries = graft.Tables.embeddings(s, sf0001)
      .filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val src = Files.createTempDirectory("graft-s13-src").toString
    try {
      queries.filter(col("q_id") % 50 === 0).coalesce(1)
        .write.mode("overwrite").parquet(src)
      val stream = s.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "q_id BIGINT, q_emb ARRAY<FLOAT>"))
        .parquet(src)
      val probe = Vectors.rowResidualAdcProbe(
          Vectors.rowRoute(stream, cents), cbRows, cents)
        .drop("q_emb")
      val joined = probe.join(codes, Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), Vectors.adcLookup.as("adist"))
      val q = joined.writeStream
        .format("memory").queryName("s13_test").outputMode("append").start()
      try {
        q.processAllAvailable()
        val afterFirst = s.table("s13_test").count()
        queries.filter(col("q_id") % 50 =!= 0).coalesce(1)
          .write.mode("append").parquet(src)
        q.processAllAvailable()
        val got = s.table("s13_test")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        // liveness: both micro-batches contributed rows
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
