package graft.streaming

import graft.SparkSuite
import graft.queries.Vectors
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** s16's streaming half + DELETION liveness (VERDICT r19 next #1): a
  * streaming serving node over the takedown index must not emit any
  * deleted vector — and the proof must be LIVE, not vacuous: some
  * deleted ids are still PHYSICALLY present in the scanned files (the
  * un-vacuumed tombstone wave), so only the stream-static anti-join
  * keeps them out of the candidates. Output parity alone would pass
  * with the anti-join dead if all deletions had been vacuumed.
  */
class StreamDeleteLivenessSpec extends SparkSuite {

  test("deleted-but-unvacuumed ids are provably absent from streamed candidates; unmasked probe provably emits them") {
    val s = spark
    val batch = graft.SparkEntry.queries("s16_stream_tombstone_living")(s, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val idx = Vectors.ivfTombstoneIndex(s, sf0001)
    val physical = s.read.parquet(s"$idx/vectors").select("vec_id")
      .unionByName(Vectors.stagedRows(s, idx).get.select("vec_id"))
      .distinct().collect().map(_.getLong(0)).toSet
    val liveTomb = physical.filter(_ % 14 == 9)
    assert(liveTomb.nonEmpty,
      "no deleted id is physically present — the anti-join is untestable")

    val cents = Vectors.loadCentroids(s, idx)
    val queries = graft.Tables.embeddings(s, sf0001)
      .filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val src = Files.createTempDirectory("graft-s16-src").toString
    try {
      queries.filter(col("q_id") % 50 === 0).coalesce(1)
        .write.mode("overwrite").parquet(src)
      val stream = s.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "q_id BIGINT, q_emb ARRAY<FLOAT>"))
        .parquet(src)
      val routed = Vectors.rowRoute(stream, cents)
        .withColumn("q_nrm", expr("sqrt(array_dot(q_emb, q_emb))"))
      def score(side: org.apache.spark.sql.DataFrame) = side
        .join(routed, Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          (expr("array_dot(embedding, q_emb)") / (col("nrm") * col("q_nrm")))
            .as("cos"))
      def serving(mask: Boolean) = {
        def side(df: org.apache.spark.sql.DataFrame) =
          if (mask) Vectors.minusTombstones(s, idx, df) else df
        score(side(s.read.parquet(s"$idx/vectors")))
          .unionByName(score(side(Vectors.stagedRows(s, idx).get)))
      }
      val q = serving(mask = true).writeStream
        .format("memory").queryName("s16_test").outputMode("append").start()
      try {
        q.processAllAvailable()
        queries.filter(col("q_id") % 50 =!= 0).coalesce(1)
          .write.mode("append").parquet(src)
        q.processAllAvailable()
        val got = s.table("s16_test")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(got === batch,
          s"stream/batch divergence: stream-only=${(got -- batch).take(5)}, " +
            s"batch-only=${(batch -- got).take(5)}")
        assert(got.map(_._2).intersect(liveTomb).isEmpty,
          "a deleted (live-tombstoned) vector reached the streamed candidates")
      } finally q.stop()
      // the liveness half: the SAME shape without the mask (batch-routed
      // — the stream source can't run in a collect) emits deleted ids —
      // so the anti-join is what keeps them out, not the layout
      val routedBatch = Vectors.rowRoute(queries, cents)
        .withColumn("q_nrm", expr("sqrt(array_dot(q_emb, q_emb))"))
      def scoreBatch(side: org.apache.spark.sql.DataFrame) = side
        .join(routedBatch, Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select("vec_id")
      val unmasked = scoreBatch(s.read.parquet(s"$idx/vectors"))
        .unionByName(scoreBatch(Vectors.stagedRows(s, idx).get))
        .collect().map(_.getLong(0)).toSet
      assert(unmasked.intersect(liveTomb).nonEmpty,
        "no deleted id is even a candidate — the mask is vacuous at this " +
          "geometry and the assertion above proves nothing")
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(src))
    }
  }
}
