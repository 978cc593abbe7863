package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState
import org.apache.spark.sql.types._

/** Streaming extension of the engine (SURVEY §2.10: the reference is
  * batch-only; its analysis windows are event-time constructs, so the same
  * transforms run unchanged under Structured Streaming — this module holds
  * the streaming-specific plumbing: sources, watermarks, stateful ops).
  *
  * Every transform here takes/returns DataFrame and works identically on a
  * batch frame or a `readStream` frame — the batch equivalents are the
  * oracle-checked queries (s1_tumbling_window), the streaming specs assert
  * stream-vs-batch equality on the same input.
  */
object StreamOps {

  /** The events schema as produced by Tables.spikes, for file-stream reads
    * (streaming sources need an explicit schema).
    */
  val eventsMicrosSchema: StructType = StructType(Seq(
    StructField("time", LongType), StructField("gid", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType),
    StructField("event_id", LongType)))

  /** File-based event stream: each parquet file dropped into `dir` is a
    * micro-batch (the post-hoc simulation-report model made incremental).
    */
  def fileStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsMicrosSchema).parquet(dir)
      .withColumn("ts", timestamp_micros(col("time") + lit(graft.Tables.EventsEpochMicros)))

  /** Tumbling event-time window aggregation with a watermark — the
    * streaming form of the batch s1_tumbling_window query. On a batch
    * DataFrame the watermark is a no-op and results are identical.
    */
  def tumblingCounts(events: DataFrame, window: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("day"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding event-time window (the reference's overlapping trial windows,
    * streaming form): window length `len`, slide `slide`.
    */
  def slidingCounts(events: DataFrame, len: String, slide: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), len, slide), col("gid"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("gid"), col("n"))

  /** Stream-static enrichment + per-class tumbling counts — the PSTH made
    * incremental: each micro-batch joins the STATIC neuron-class dimension
    * (broadcast — at scale the dim is the per-circuit neuron table, small
    * next to the stream; Spark re-plans the static side per micro-batch),
    * then event-time windowed counts per class with watermark-bounded
    * state. The sum goes through decimal so streaming partial-agg order
    * cannot drift the double. On a batch frame the watermark is a no-op
    * and the plan is the batch report⋈nodes PSTH itself.
    */
  def enrichedClassCounts(events: DataFrame, classes: DataFrame,
      window: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(org.apache.spark.sql.functions.broadcast(classes), Seq("gid"))
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("neuron_class"))
      .agg(
        count(lit(1)).as("n"),
        graft.queries.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("day"), col("neuron_class"),
        col("n"), col("sum_value"))

  /** Stream-stream inner join with watermark-bounded buffers (the
    * attribution join): pair each right-side event with the same gid's
    * left-side events in the preceding `windowMicros`. Both sides carry
    * watermarks and the event-time range condition bounds the buffered
    * state — Spark evicts a buffered row once the opposite watermark
    * passes its join horizon, so state is O(events per horizon), not
    * O(stream). On batch frames the watermarks are no-ops and the plan is
    * a plain time-range join (the s5 gate's oracle form).
    */
  def attributionJoin(lhs: DataFrame, rhs: DataFrame, windowMicros: Long,
      watermark: String, joinType: String = "inner"): DataFrame = {
    val l = lhs.select(col("gid").as("l_gid"), col("event_id").as("l_id"),
        col("ts").as("l_ts"))
      .withWatermark("l_ts", watermark)
    val r = rhs.select(col("gid").as("r_gid"), col("event_id").as("r_id"),
        col("ts").as("r_ts"))
      .withWatermark("r_ts", watermark)
    // left_outer: the distinct streaming semantics class — an unmatched
    // left row is HELD in state until the watermark proves no partner can
    // still arrive, then emitted with nulls (batch left joins emit
    // immediately; the equality of the two is what StreamOpsSpec pins).
    // Both sides' time-bound predicates are what let the engine evict
    // state at the watermark instead of buffering the streams forever.
    l.join(r,
      col("l_gid") === col("r_gid") &&
        col("l_ts") <= col("r_ts") &&
        col("l_ts") >= col("r_ts") - expr(s"INTERVAL $windowMicros MICROSECOND"),
      joinType)
      .select(col("l_gid").as("gid"), col("l_id"), col("r_id"),
        (unix_micros(col("r_ts")) - unix_micros(col("l_ts"))).as("lag_us"))
  }

  /** Streaming exact dedup: drop repeated keys across micro-batches with
    * bounded state — dropDuplicatesWithinWatermark keeps each key only
    * until the watermark passes it, so state is O(keys per watermark
    * horizon), not O(all keys ever) (the streaming form of t1-style exact
    * dedup; batch equivalent is dropDuplicates on the same keys).
    */
  def dedupeStream(events: DataFrame, keys: Seq[String], watermark: String): DataFrame =
    if (events.isStreaming)
      events
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
    else
      // batch restatement: Spark rejects the watermark variant on batch
      // frames; without a watermark the state bound is moot and the
      // semantics collapse to plain key dedup
      events.dropDuplicates(keys.head, keys.tail: _*)

  /** Stateful sessionization via flatMapGroupsWithState-style API:
    * per-gid session = burst of events with gaps < `gapMicros`. Emits one
    * row per closed session (count, span). Demonstrates
    * KeyValueGroupedDataset custom state (§2.10 mapGroupsWithState).
    * Batch mode: mapGroupsWithState isn't available, so sessions are
    * derived with a window-function plan — [[sessionizeBatch]] — and the
    * spec asserts the two agree on the same input.
    */
  def sessionizeBatch(events: DataFrame, gapMicros: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("gid").orderBy("time")
    events
      .withColumn("gap", col("time") - lag("time", 1).over(w))
      .withColumn("new_session",
        when(col("gap").isNull || col("gap") >= gapMicros, 1).otherwise(0))
      .withColumn("session_id", sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("gid", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min("time").as("t_start"),
        max("time").as("t_end"))
      .withColumn("span", col("t_end") - col("t_start"))
  }

  /** Streaming stateful sessionization with mapGroupsWithState: buffers the
    * open session per gid, emits closed sessions. State is one (start,
    * last, count) triple per gid — constant memory per key.
    */
  def sessionizeStreaming(spark: SparkSession, events: DataFrame, gapMicros: Long): DataFrame = {
    import org.apache.spark.sql.{Row => R}
    val outSchema = StructType(Seq(
      StructField("gid", LongType), StructField("n_events", LongType),
      StructField("t_start", LongType), StructField("t_end", LongType),
      StructField("span", LongType)))
    val rowEnc: ExpressionEncoder[R] =
      ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val stateEnc = org.apache.spark.sql.Encoders.product[SessionState]
    val longEnc = org.apache.spark.sql.Encoders.scalaLong
    val tupleEnc = org.apache.spark.sql.Encoders.tuple(longEnc, longEnc)
    val keyed = events.select(col("gid").cast("long"), col("time").cast("long"))
      .as(org.apache.spark.sql.Encoders.tuple(longEnc, longEnc))
      .groupByKey(_._1)(longEnc)
    keyed.flatMapGroupsWithState(
      org.apache.spark.sql.streaming.OutputMode.Append(),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())(
      (gid: Long, rows: Iterator[(Long, Long)], state: GroupState[SessionState]) => {
        val times = rows.map(_._2).toArray.sorted
        var sessions = List.empty[R]
        var st = state.getOption.getOrElse(SessionState(-1L, -1L, 0L))
        for (t <- times) {
          if (st.count == 0L) st = SessionState(t, t, 1L)
          else if (t - st.last >= gapMicros) {
            sessions ::= R(gid, st.count, st.start, st.last, st.last - st.start)
            st = SessionState(t, t, 1L)
          } else st = st.copy(last = t, count = st.count + 1)
        }
        state.update(st)
        sessions.reverseIterator
      })(stateEnc, rowEnc)
      .toDF()
  }

  final case class SessionState(start: Long, last: Long, count: Long)
}
