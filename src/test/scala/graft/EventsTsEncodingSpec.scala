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

  test("narrowed value/id regenerations widen to the canonical schema") {
    // the driver has regenerated testdata with schema drift twice; these
    // are the remaining plausible drifts: int32 ids, float32 values,
    // nullable value, and a dropped/added props column
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-col-enc").toString
    val originUs = Tables.EventsEpochMicros

    val canonical = spark.range(50)
      .select(
        col("id").as("event_id"),
        timestamp_micros(lit(originUs) + col("id") * lit(3600000000L))
          .cast("timestamp_ntz").as("ts"),
        pmod(col("id"), lit(7L)).as("user_id"),
        concat(lit("et"), pmod(col("id"), lit(3L))).as("event_type"),
        when(col("id") % 10 === 0, lit(null).cast("double"))
          .otherwise(col("id") * 1.5).as("value"),
        lit("p").as("props"))
      .cache()
    canonical.write.mode("overwrite").parquet(s"$dir/canon/events.parquet")
    // narrowed: int32 ids, float32 value, no props
    canonical.select(
        col("event_id").cast("int").as("event_id"), col("ts"),
        col("user_id").cast("int").as("user_id"), col("event_type"),
        col("value").cast("float").as("value"))
      .write.mode("overwrite").parquet(s"$dir/narrow/events.parquet")

    val narrowSchema = spark.read.parquet(s"$dir/narrow/events.parquet").schema
    assert(narrowSchema("event_id").dataType === IntegerType)
    assert(narrowSchema("value").dataType === FloatType)

    // Tables.events widens both reads to one schema…
    val canonTypes = Tables.events(spark, s"$dir/canon").schema
      .fields.map(f => f.name -> f.dataType).toMap
    val narrowTypes = Tables.events(spark, s"$dir/narrow").schema
      .fields.map(f => f.name -> f.dataType).toMap
    for (c <- Seq("event_id", "user_id", "value"))
      assert(narrowTypes(c) === canonTypes(c), s"column $c not widened")
    // …and spikes rows agree (float32 1.5-multiples are exact in double)
    val a = Tables.spikes(spark, s"$dir/canon").orderBy("event_id")
      .collect().map(_.toSeq)
    val b = Tables.spikes(spark, s"$dir/narrow").orderBy("event_id")
      .collect().map(_.toSeq)
    assert(a.length === 50)
    assert(a.toSeq === b.toSeq)
    // nulls in value survive as nulls, not zeros
    assert(Tables.spikes(spark, s"$dir/narrow")
      .filter(col("value").isNull).count() === 5)
  }
}
