package graft.streaming

import graft.SparkSuite
import graft.queries.Text
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** s7's streaming half: the SAME per-row-signature probe of the persisted
  * bucketed corpus index must run as a genuine Structured Streaming
  * stream-static join — arriving documents fed in two micro-batches —
  * and emit exactly the batch gate's candidate pairs. This is the t26
  * maintenance loop closed end-to-end: the index is static state, the
  * shard is a stream, and nothing about the plan changes shape between
  * the two modes because the signature derivation is map-only
  * ([[Text.rowLshKeys]] — an aggregate there would be illegal in
  * append mode AND a scale bug in batch).
  */
class StreamIncrementalDedupSpec extends SparkSuite {

  test("two-micro-batch stream against the static index equals the batch gate") {
    val s = spark
    val batch = graft.SparkEntry.queries("s7_stream_neardup_candidates")(s, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // the arriving shard as a file stream, split into two micro-batches
    val shard = graft.Tables.documents(s, sf0001)
      .filter(col("doc_id") % 10 === 7)
      .select("doc_id", "text")
    val src = Files.createTempDirectory("graft-s7-src").toString
    try {
      shard.filter(col("doc_id") % 20 === 7).coalesce(1)
        .write.mode("overwrite").parquet(src)
      val stream = s.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, text STRING"))
        .parquet(src)
      // same probe plan as the gate: per-row keys -> stream-static join
      // against the bucketed index scan -> dropDuplicates (streaming
      // state; unbounded here, watermark-bounded in production)
      val idx = Text.indexForTesting(s, sf0001)
      val joined = idx.select(col("bk"), col("doc_id").as("doc1"))
        .join(Text.rowLshKeys(stream).withColumnRenamed("doc_id", "doc2"), "bk")
        .select("doc1", "doc2").dropDuplicates("doc1", "doc2")
      val q = joined.writeStream
        .format("memory").queryName("s7_test").outputMode("append").start()
      try {
        q.processAllAvailable()
        shard.filter(col("doc_id") % 20 =!= 7).coalesce(1)
          .write.mode("append").parquet(src)
        q.processAllAvailable()
        val got = s.table("s7_test")
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
