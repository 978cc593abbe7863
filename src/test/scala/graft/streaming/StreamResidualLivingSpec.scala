package graft.streaming

import graft.SparkSuite
import graft.queries.Vectors
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** s15's streaming half: per-row route + residual ADC tables against
  * the MAINTAINED residual root — the stream must see every code the
  * index owns, including staged-insert codes between stageInsert and
  * flush. Two pins: (1) two micro-batches == the batch gate, and
  * (2) LIVENESS — codes that exist ONLY in residual/staging (the
  * unflushed delta half) appear among the emitted candidates; output
  * parity alone would pass with the staging union dead if staging
  * happened to be empty.
  */
class StreamResidualLivingSpec extends SparkSuite {

  test("two-micro-batch living-residual stream equals batch; staged-only codes emitted") {
    val s = spark
    val batch = graft.SparkEntry.queries("s15_stream_residual_living")(s, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val root = Vectors.residualLivingIndexForTesting(s, sf0001)
    val (cent, _, _, _, cbRows) = Vectors.residualPqOpen(s, root)
    val codes = Vectors.residualServingCodes(s, root)
    val cents = cent.orderBy("cell").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))

    // the staged-ONLY population: second delta half, never flushed
    val stagedOnly = Vectors.residualStagedCodes(s, root)
      .map(_.select("vec_id").collect().map(_.getLong(0)).toSet)
      .getOrElse(Set.empty)
    assert(stagedOnly.nonEmpty, "fixture lost its staged-only codes")

    val queries = graft.Tables.embeddings(s, sf0001)
      .filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val src = Files.createTempDirectory("graft-s15-src").toString
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
        .format("memory").queryName("s15_test").outputMode("append").start()
      try {
        q.processAllAvailable()
        val afterFirst = s.table("s15_test").count()
        queries.filter(col("q_id") % 50 =!= 0).coalesce(1)
          .write.mode("append").parquet(src)
        q.processAllAvailable()
        val got = s.table("s15_test")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(afterFirst > 0 && got.size > afterFirst.toInt,
          s"micro-batches did not both emit: $afterFirst then ${got.size}")
        assert(got === batch,
          s"stream/batch divergence: stream-only=${(got -- batch).take(5)}, " +
            s"batch-only=${(batch -- got).take(5)}")
        // liveness: at least one emitted candidate exists ONLY in the
        // residual staging table
        val emitted = got.map(_._2)
        assert((emitted & stagedOnly).nonEmpty,
          "no staged-only residual code reached the stream's candidates " +
            "— the staging union is dead in the serving plan")
      } finally q.stop()
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(src))
    }
  }
}
