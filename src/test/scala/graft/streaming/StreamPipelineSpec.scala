package graft.streaming

import graft.SparkSuite
import graft.queries.Text
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** s11's streaming half: the COMPOSED pipeline — admission filters,
  * exact-dedup anti-join against the hash index, per-row signatures,
  * near-dup probe of the t26 signature index — as ONE Structured
  * Streaming append-mode query over two micro-batches, equal to the
  * batch gate. This is the composition check the per-op streaming specs
  * (s7 probe alone, s10 admission alone) cannot make: both maintained
  * indexes consulted by one streaming plan, with no stage boundary
  * where an aggregate could silently make the chain append-illegal.
  */
class StreamPipelineSpec extends SparkSuite {

  test("two-micro-batch composed pipeline equals the batch gate") {
    val s = spark
    val batch = graft.SparkEntry.queries("s11_stream_pipeline")(s, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val delta = Text.streamAdmissionDelta(graft.Tables.documents(s, sf0001))
    val src = Files.createTempDirectory("graft-s11-src").toString
    try {
      delta.filter(col("doc_id") % 2 === 0).coalesce(1)
        .write.mode("overwrite").parquet(src)
      val stream = s.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"))
        .parquet(src)
      val (eidx, _) = Text.exactHashIndexForTesting(s, sf0001)
      val (idx, buckets) = Text.indexWithBucketsForTesting(s, sf0001)
      val out = Text.pipelineCandidates(stream, eidx, idx, buckets,
        requirePlan = false)
      val q = out.writeStream
        .format("memory").queryName("s11_test").outputMode("append").start()
      try {
        q.processAllAvailable()
        delta.filter(col("doc_id") % 2 =!= 0).coalesce(1)
          .write.mode("append").parquet(src)
        q.processAllAvailable()
        val got = s.table("s11_test")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got === batch,
          s"stream/batch divergence: stream-only=${got -- batch}, " +
            s"batch-only=${batch -- got}")
      } finally q.stop()
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(src))
    }
  }
}
