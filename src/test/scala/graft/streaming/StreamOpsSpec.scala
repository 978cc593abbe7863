package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming specs: the same transform over a file stream (fed in two
  * micro-batches) must agree with the batch plan over the full input.
  */
class StreamOpsSpec extends SparkSuite {

  private lazy val stagingDirs: (String, String) = {
    val src = Files.createTempDirectory("graft-stream-src").toString
    val half1 = Files.createTempDirectory("graft-stream-b1").toString
    val ev = graft.Tables.spikes(spark, sf0001)
    ev.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(src)
    ev.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.mode("overwrite").parquet(half1)
    (src, half1)
  }

  test("tumbling window: stream over two micro-batches equals batch") {
    val (srcDir, moreDir) = stagingDirs
    val stream = StreamOps.fileStream(spark, srcDir)
    val agg = StreamOps.tumblingCounts(stream, "1 day", "0 seconds")
    val q = agg.writeStream
      .format("memory").queryName("tumbling_test").outputMode("complete").start()
    try {
      q.processAllAvailable()
      // drop the second half in as a new micro-batch
      val more = spark.read.parquet(moreDir)
      more.coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      val got = spark.table("tumbling_test")
      val batch = StreamOps.tumblingCounts(
        graft.Tables.spikes(spark, sf0001)
          .withColumn("ts", timestamp_micros(col("time") + lit(graft.Tables.EventsEpochMicros))),
        "1 day", "0 seconds")
      assert(got.count() === batch.count())
      val diff = got.join(batch, Seq("day", "event_type"))
        .filter(got("n") =!= batch("n")).count()
      assert(diff === 0)
    } finally q.stop()
  }

  test("stream-static enrichment: two micro-batches equal the batch per-class counts") {
    val src = Files.createTempDirectory("graft-enrich-src").toString
    val ev = graft.Tables.spikes(spark, sf0001)
      .withColumn("ts", timestamp_micros(col("time") + lit(graft.Tables.EventsEpochMicros)))
      .select("gid", "ts", "value", "event_id")
    val classes = ev.select("gid").distinct()
      .withColumn("neuron_class",
        when(col("gid") % 2 === 0, "even").otherwise("odd"))
    ev.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    val agg = StreamOps.enrichedClassCounts(stream, classes, "1 day", "0 seconds")
    val q = agg.writeStream
      .format("memory").queryName("enrich_test").outputMode("complete").start()
    try {
      q.processAllAvailable()
      ev.filter(col("event_id") % 2 === 1).coalesce(1)
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      val got = spark.table("enrich_test")
      val batch = StreamOps.enrichedClassCounts(ev, classes, "1 day", "0 seconds")
      assert(got.count() === batch.count())
      val diff = got.join(batch, Seq("day", "neuron_class"))
        .filter(got("n") =!= batch("n") || got("sum_value") =!= batch("sum_value"))
        .count()
      assert(diff === 0)
    } finally q.stop()
  }

  test("stream-stream attribution join: two time-split micro-batches equal batch") {
    val srcC = Files.createTempDirectory("graft-ssj-c").toString
    val srcP = Files.createTempDirectory("graft-ssj-p").toString
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("user_id").as("gid"), col("event_id"), col("ts"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click").drop("event_type")
    val purchases = ev.filter(col("event_type") === "purchase").drop("event_type")
    // time-split (not interleaved): batch 2 is strictly newer, so the
    // 2-day watermark can never evict a row whose 1-hour partner is
    // still to come
    val cut = ev.agg(min(unix_micros(col("ts"))) + 15L * 86400000000L).head.getLong(0)
    def firstHalf(df: org.apache.spark.sql.DataFrame) =
      df.filter(unix_micros(col("ts")) < cut)
    def secondHalf(df: org.apache.spark.sql.DataFrame) =
      df.filter(unix_micros(col("ts")) >= cut)
    firstHalf(clicks).coalesce(1).write.mode("overwrite").parquet(srcC)
    firstHalf(purchases).coalesce(1).write.mode("overwrite").parquet(srcP)
    val schema = spark.read.parquet(srcC).schema
    val win = 3600000000L
    val joined = StreamOps.attributionJoin(
      spark.readStream.schema(schema).parquet(srcC),
      spark.readStream.schema(schema).parquet(srcP),
      windowMicros = win, watermark = "2 days")
    val q = joined.writeStream
      .format("memory").queryName("ssj_test").outputMode("append").start()
    try {
      q.processAllAvailable()
      secondHalf(clicks).coalesce(1).write.mode("append").parquet(srcC)
      secondHalf(purchases).coalesce(1).write.mode("append").parquet(srcP)
      q.processAllAvailable()
      val got = spark.table("ssj_test")
      val batch = StreamOps.attributionJoin(clicks, purchases, win, "2 days")
      assert(got.count() === batch.count())
      assert(got.except(batch).isEmpty && batch.except(got).isEmpty)
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join: watermark-flushed stream equals batch left join") {
    val srcC = Files.createTempDirectory("graft-ssjo-c").toString
    val srcP = Files.createTempDirectory("graft-ssjo-p").toString
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("user_id").as("gid"), col("event_id"), col("ts"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click").drop("event_type")
    val purchases = ev.filter(col("event_type") === "purchase").drop("event_type")
    val cut = ev.agg(min(unix_micros(col("ts"))) + 15L * 86400000000L).head.getLong(0)
    val maxTs = ev.agg(max(unix_micros(col("ts")))).head.getLong(0)
    def half(df: org.apache.spark.sql.DataFrame, first: Boolean) =
      if (first) df.filter(unix_micros(col("ts")) < cut)
      else df.filter(unix_micros(col("ts")) >= cut)
    half(clicks, first = true).coalesce(1).write.mode("overwrite").parquet(srcC)
    half(purchases, first = true).coalesce(1).write.mode("overwrite").parquet(srcP)
    val schema = spark.read.parquet(srcC).schema
    val win = 3600000000L
    val joined = StreamOps.attributionJoin(
      spark.readStream.schema(schema).parquet(srcC),
      spark.readStream.schema(schema).parquet(srcP),
      windowMicros = win, watermark = "2 days", joinType = "left_outer")
    val q = joined.writeStream
      .format("memory").queryName("ssjo_test").outputMode("append").start()
    try {
      q.processAllAvailable()
      half(clicks, first = false).coalesce(1).write.mode("append").parquet(srcC)
      half(purchases, first = false).coalesce(1).write.mode("append").parquet(srcP)
      q.processAllAvailable()
      // unmatched lefts near the stream end sit in state until the
      // watermark passes them — a far-future sentinel row on BOTH inputs
      // (the global watermark is the min across sources) forces the
      // flush; gid -1 matches nothing and is excluded from the compare
      val sentinel = spark.range(1).select(
        lit(-1L).as("gid"), lit(-1L).as("event_id"),
        to_timestamp(lit((maxTs + 30L * 86400000000L) / 1000000.0)).as("ts"))
      sentinel.coalesce(1).write.mode("append").parquet(srcC)
      sentinel.coalesce(1).write.mode("append").parquet(srcP)
      q.processAllAvailable()
      val got = spark.table("ssjo_test").filter(col("gid") =!= -1L)
      val batch = StreamOps.attributionJoin(
        clicks, purchases, win, "2 days", joinType = "left_outer")
      assert(got.count() === batch.count())
      assert(got.except(batch).isEmpty && batch.except(got).isEmpty)
      // the outer semantics actually exercised: some clicks have no
      // purchase partner and emit null r_id
      assert(got.filter(col("r_id").isNull).count() > 0)
    } finally q.stop()
  }

  test("streaming dedup: duplicates across micro-batches are dropped") {
    val src = Files.createTempDirectory("graft-dedup-src").toString
    val ev = graft.Tables.spikes(spark, sf0001).limit(200)
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    val stream = StreamOps.fileStream(spark, src)
    val dedup = StreamOps.dedupeStream(stream, Seq("event_id"), "1 hour")
      .select("event_id")
    val q = dedup.writeStream
      .format("memory").queryName("dedup_test").outputMode("append").start()
    try {
      q.processAllAvailable()
      // feed the SAME rows again as a second micro-batch: all duplicates,
      // all inside the watermark horizon -> nothing new emitted
      spark.read.parquet(src).coalesce(1).write.mode("append").parquet(src)
      q.processAllAvailable()
      val got = spark.table("dedup_test")
      val batch = ev.dropDuplicates("event_id")
      assert(got.count() === batch.count())
      assert(got.select("event_id").except(batch.select("event_id")).count() === 0)
    } finally q.stop()
  }

  test("stateful sessionization: streaming state matches batch plan for closed sessions") {
    val gap = 3600000000L // 1h in µs
    val ev = graft.Tables.spikes(spark, sf0001)
    val batchSessions = StreamOps.sessionizeBatch(ev, gap)
      .filter(col("n_events") > 0)
    // streaming run over a single batch containing everything: all sessions
    // except each gid's last (still open) are emitted
    val src = Files.createTempDirectory("graft-sess-src").toString
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    val stream = StreamOps.fileStream(spark, src)
    val sess = StreamOps.sessionizeStreaming(spark, stream, gap)
    val q = sess.writeStream
      .format("memory").queryName("sessions_test").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sessions_test")
      // batch sessions minus the open (= per-gid last) session
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("gid").orderBy(col("t_start").desc)
      val closed = batchSessions.withColumn("rk", row_number().over(w))
        .filter(col("rk") > 1)
        .select("gid", "n_events", "t_start", "t_end", "span")
      assert(got.count() === closed.count())
      val diff = got.join(closed, Seq("gid", "t_start"))
        .filter(got("n_events") =!= closed("n_events") || got("t_end") =!= closed("t_end"))
        .count()
      assert(diff === 0)
    } finally q.stop()
  }
}
