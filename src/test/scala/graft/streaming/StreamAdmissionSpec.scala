package graft.streaming

import graft.SparkSuite
import graft.queries.Text
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** s10's streaming half: the composed admission pipeline — map-only
  * scoring/filter stages plus the exact-dedup anti-join against the
  * persisted corpus hash index — must run as a genuine Structured
  * Streaming append-mode query (arriving documents fed in two
  * micro-batches, stream-static LEFT ANTI join against the bucketed
  * index) and emit exactly the batch gate's survivors. Every stage is
  * per-row by construction, so the plan is identical between modes; an
  * aggregate anywhere in the admission path would fail HERE first
  * (append-mode illegality) before it failed at scale.
  */
class StreamAdmissionSpec extends SparkSuite {

  test("two-micro-batch streaming admission equals the batch gate") {
    val s = spark
    val batch = graft.SparkEntry.queries("s10_stream_admission")(s, sf0001)
      .collect().map(_.getLong(0)).toSet

    val delta = Text.streamAdmissionDelta(graft.Tables.documents(s, sf0001))
    val src = Files.createTempDirectory("graft-s10-src").toString
    try {
      delta.filter(col("doc_id") % 2 === 0).coalesce(1)
        .write.mode("overwrite").parquet(src)
      val stream = s.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"))
        .parquet(src)
      val (idx, buckets) = Text.exactHashIndexForTesting(s, sf0001)
      val out = Text.admissionSurvivors(stream, idx, buckets, requirePlan = false)
      val q = out.writeStream
        .format("memory").queryName("s10_test").outputMode("append").start()
      try {
        q.processAllAvailable()
        delta.filter(col("doc_id") % 2 =!= 0).coalesce(1)
          .write.mode("append").parquet(src)
        q.processAllAvailable()
        val got = s.table("s10_test").collect().map(_.getLong(0)).toSet
        assert(got === batch,
          s"stream/batch divergence: stream-only=${got -- batch}, " +
            s"batch-only=${batch -- got}")
      } finally q.stop()
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(src))
    }
  }
}
