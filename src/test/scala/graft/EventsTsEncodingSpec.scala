package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pins BOTH on-disk encodings the driver has shipped for `events.ts`:
  * int64 nanoseconds (TIMESTAMP(NANOS), read as long via `nanosAsLong`) and
  * `timestamp[us]` (what pandas/pyarrow write). `Tables.spikes` must produce
  * identical (time, gid) rows from either, so a testdata regeneration that
  * flips the encoding cannot silently zero the correctness gate again.
  */
class EventsTsEncodingSpec extends SparkSuite {

  test("Tables.spikes is identical across int64-nanos and timestamp[us] ts encodings") {
    val dir = Files.createTempDirectory("graft-ts-enc").toString
    val originNs = Tables.EventsEpochMicros * 1000L

    // 100 events spread over ~30 days with sub-millisecond jitter so the
    // ns→µs truncation path is actually exercised (ts_ns % 1000 != 0).
    val base = spark.range(100)
      .select(
        col("id").as("event_id"),
        (lit(originNs) + col("id") * lit(259200000000L) +
          pmod(abs(hash(col("id"))), lit(999983L))).as("ts_ns"),
        pmod(col("id"), lit(7L)).as("user_id"),
        concat(lit("et"), pmod(col("id"), lit(3L))).as("event_type"),
        (col("id") * 1.5).as("value"))
      .cache()

    base.select(col("event_id"), col("ts_ns").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(s"$dir/nanos/events.parquet")

    base.select(col("event_id"),
        timestamp_micros(expr("ts_ns div 1000")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(s"$dir/micros/events.parquet")

    // Sanity: the two fixtures really carry different physical types.
    assert(spark.read.parquet(s"$dir/nanos/events.parquet").schema("ts").dataType
      === org.apache.spark.sql.types.LongType)
    assert(spark.read.parquet(s"$dir/micros/events.parquet").schema("ts").dataType
      === org.apache.spark.sql.types.TimestampNTZType)

    val a = Tables.spikes(spark, s"$dir/nanos").orderBy("event_id")
      .collect().map(_.toSeq)
    val b = Tables.spikes(spark, s"$dir/micros").orderBy("event_id")
      .collect().map(_.toSeq)
    assert(a.length === 100)
    assert(a.toSeq === b.toSeq)
    // times are micros since the stream origin, non-negative
    val times = Tables.spikes(spark, s"$dir/nanos").agg(min("time"), max("time"))
      .head()
    assert(times.getLong(0) >= 0L)
  }
}
