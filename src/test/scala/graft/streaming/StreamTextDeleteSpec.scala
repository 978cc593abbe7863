package graft.streaming

import graft.SparkSuite
import graft.queries.Text
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The text takedown's streaming liveness twin (the vector tier's
  * StreamDeleteLivenessSpec, for s18/s19): the admission + near-dup
  * pipeline over the tombstone-MASKED maintained indexes must run as a
  * genuine two-micro-batch append-mode stream and emit exactly the
  * batch gate's rows — with the deletion effects live in the streamed
  * output: a replay of a deleted doc's text is admitted (it arrives in
  * a micro-batch and survives the stream-static anti-join), and
  * deleted-but-unvacuumed corpus docs never appear as candidate
  * sources.
  */
class StreamTextDeleteSpec extends SparkSuite {

  test("two-micro-batch streaming pipeline over the takedown indexes equals the batch gate") {
    val s = spark
    val batch = graft.SparkEntry
      .queries("s19_stream_pipeline_deleted")(s, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val ((idx, buckets), (eidx, _), _, _) =
      Text.deletedIndexesForTesting(s, sf0001)
    val delta = Text.streamAdmissionDelta(graft.Tables.documents(s, sf0001))
    val src = Files.createTempDirectory("graft-s19-src").toString
    try {
      delta.filter(col("doc_id") % 2 === 0).coalesce(1)
        .write.mode("overwrite").parquet(src)
      val stream = s.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"))
        .parquet(src)
      val out = Text.pipelineCandidates(
        stream, eidx, idx, buckets, requirePlan = false)
      val q = out.writeStream
        .format("memory").queryName("s19_test").outputMode("append").start()
      try {
        q.processAllAvailable()
        delta.filter(col("doc_id") % 2 =!= 0).coalesce(1)
          .write.mode("append").parquet(src)
        q.processAllAvailable()
        val got = s.table("s19_test")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got === batch,
          s"stream/batch divergence: stream-only=${got -- batch}, " +
            s"batch-only=${batch -- got}")
        // no deleted corpus doc (vacuumed or tombstoned) as a streamed
        // candidate source (the NON-vacuous control for this — a deleted
        // doc IS a candidate source without the takedown — is pinned at
        // the t26/t29 level by TextTombstoneSpec)
        assert(!got.exists(p => Set(2L, 9L).contains(p._1 % 14)),
          "streamed candidates include a deleted candidate source")
      } finally q.stop()
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(src))
    }
  }

  test("a replay of a DELETED doc's text is admitted by the stream (revival is live)") {
    val s = spark
    // control: the takedown-free batch admission vetoes the replay
    val s10 = graft.SparkEntry.queries("s10_stream_admission")(s, sf0001)
      .collect().map(_.getLong(0)).toSet
    val (_, (eidx, buckets), _, _) = Text.deletedIndexesForTesting(s, sf0001)
    val delta = Text.streamAdmissionDelta(graft.Tables.documents(s, sf0001))
    val src = Files.createTempDirectory("graft-s18-src").toString
    try {
      delta.filter(col("doc_id") % 2 === 0).coalesce(1)
        .write.mode("overwrite").parquet(src)
      val stream = s.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"))
        .parquet(src)
      val out = Text.admissionSurvivors(stream, eidx, buckets,
        requirePlan = false)
      val q = out.writeStream
        .format("memory").queryName("s18_test").outputMode("append").start()
      try {
        q.processAllAvailable()
        delta.filter(col("doc_id") % 2 =!= 0).coalesce(1)
          .write.mode("append").parquet(src)
        q.processAllAvailable()
        val got = s.table("s18_test").collect().map(_.getLong(0)).toSet
        val revived = got -- s10
        assert(revived.nonEmpty,
          "the stream admitted no revived replay — deletion not live")
        revived.foreach { id =>
          assert(id >= 1000000000L &&
              Set(2L, 9L).contains((id - 1000000000L) % 14),
            s"streamed revival $id is not a replay of a deleted doc")
        }
      } finally q.stop()
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(src))
    }
  }
}
