package graft.streaming

import graft.SparkSuite
import graft.queries.Vectors
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** s9's streaming half: the SAME per-row route + per-row ADC distance
  * table probing the static PQ code table must run as a genuine
  * Structured Streaming stream-static join — arriving query vectors fed
  * in two micro-batches — and emit exactly the batch gate's ADC
  * distances. Both per-row derivations ([[Vectors.rowRoute]],
  * [[Vectors.rowAdcProbe]]) are map-only, which is what makes the plan
  * append-mode legal; the memoized batch forms (routeQueries' max_by,
  * dtabArr's join+groupBy) would both be rejected as aggregates before
  * a stream join.
  */
class StreamAdcSearchSpec extends SparkSuite {

  test("two-micro-batch query stream against the static PQ codes equals the batch gate") {
    val s = spark
    val batch = graft.SparkEntry.queries("s9_stream_ivfpq_adc")(s, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val (codesArr, _, cb) = Vectors.pqForTesting(s, sf0001)
    val idx = Vectors.ivfIndexForTesting(s, sf0001)
    val cents = Vectors.loadCentroids(s, idx)
    // the static side: per-vector PQ codes, cell carried at encode time
    val codes = codesArr

    val queries = graft.Tables.embeddings(s, sf0001)
      .filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val src = Files.createTempDirectory("graft-s9-src").toString
    try {
      queries.filter(col("q_id") % 50 === 0).coalesce(1)
        .write.mode("overwrite").parquet(src)
      val stream = s.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "q_id BIGINT, q_emb ARRAY<FLOAT>"))
        .parquet(src)
      val probe = Vectors.rowAdcProbe(Vectors.rowRoute(stream, cents), cb)
        .drop("q_emb")
      val joined = probe.join(codes, Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), Vectors.adcLookup.as("adist"))
      val q = joined.writeStream
        .format("memory").queryName("s9_test").outputMode("append").start()
      try {
        q.processAllAvailable()
        queries.filter(col("q_id") % 50 =!= 0).coalesce(1)
          .write.mode("append").parquet(src)
        q.processAllAvailable()
        val got = s.table("s9_test")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(got === batch,
          s"stream/batch divergence: stream-only=${(got -- batch).take(5)}, " +
            s"batch-only=${(batch -- got).take(5)}")
      } finally q.stop()
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(src))
    }
  }
}
