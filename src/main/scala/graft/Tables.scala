package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * All loads are plain parquet scans so Catalyst pushes predicates and
  * prunes columns at the source (verified via `PushedFilters`/`ReadSchema`
  * in `.explain("formatted")`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** events.parquet has shipped with two `ts` encodings: TIMESTAMP(NANOS)
    * (which Spark 4 only reads as long, via `nanosAsLong`) and plain
    * `timestamp[us]`. Branch on the type the scan actually produced:
    *  - Long (nanos): integer `div 1000` (not `/`, which would round-trip
    *    through double and lose precision above 2^53) truncates exactly
    *    like DuckDB's ns→µs read.
    *  - Timestamp / TimestampNTZ (micros): cast to session-TZ timestamp;
    *    under the UTC session this is identity in micros, matching
    *    DuckDB's `epoch_us(ts)` oracle reads.
    */
  def tsMicros(df: DataFrame): org.apache.spark.sql.Column =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // time-window predicates over the derived micros column only reach the
    // parquet row-group stats through the MicrosPushdown unwrap rule
    graft.functions.GraftFunctions.register(spark)
    val df = load(spark, sfDir, "events")
    val withTs = df.withColumn("ts", timestamp_micros(tsMicros(df)))
    // the driver has regenerated testdata with schema drift twice (ts
    // nanos↔micros); widen the other plausible narrowings to the canonical
    // types so a regeneration with int32 ids or float32 values cannot
    // shift downstream arithmetic. Conditional on the scanned type: the
    // canonical encodings take the identity path, plans unchanged.
    import org.apache.spark.sql.types.{DoubleType, LongType}
    Seq(("user_id", LongType: org.apache.spark.sql.types.DataType),
        ("event_id", LongType), ("value", DoubleType))
      .foldLeft(withTs) { case (d, (c, t)) =>
        if (d.columns.contains(c) && d.schema(c).dataType != t)
          d.withColumn(c, col(c).cast(t))
        else d
      }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Epoch micros of 2024-01-01T00:00:00Z — the synthetic events stream's
    * origin. Event times are exposed as integral micros since this origin so
    * the Spark plan and the DuckDB oracle agree bit-for-bit (no float time).
    */
  val EventsEpochMicros: Long = 1704067200000000L

  /** events with a blueetl-style long spike/event table shape:
    * (time: long micros since origin, gid: long, event_type, value, props).
    * Mirrors the reference's (time, gid) report model
    * (reference: src/blueetl/extract/spikes.py:19).
    */
  def spikes(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .withColumn("time", unix_micros(col("ts")) - lit(EventsEpochMicros))
      .withColumnRenamed("user_id", "gid")
      .select("time", "gid", "event_type", "value", "event_id")
}
