package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** The LSH bucket cap: a degenerate mega-bucket corpus must produce a
  * bounded pair set (cap²/2, not n²/2), keep the deterministic lowest-id
  * members, and report the dropped occupancy through the observe metric.
  */
class LshCapSpec extends SparkSuite {

  private def oneBucket(n: Int) =
    spark.range(n).select(
      lit(0).as("band"), lit("deadbeef").as("bkey"),
      format_string("d%05d", col("id")).as("doc_id"))

  test("mega-bucket pair explosion is bounded by the cap") {
    val cap = 16
    val pairs = Lsh.cappedPairs(oneBucket(1000), "doc_id", "a", "b",
      "graft_lsh_spec_bound", cap).collect()
    assert(pairs.length === cap * (cap - 1) / 2)
    // deterministic kept set: the cap smallest ids
    val members = pairs.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct.sorted
    assert(members.toSeq === (0 until cap).map(i => f"d$i%05d"))
    assert(pairs.forall(r => r.getString(0) < r.getString(1)))
  }

  test("uncapped-size buckets are unaffected and drop count is observed") {
    @volatile var observed: Option[(Long, Long)] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        qe.observedMetrics.get("graft_lsh_spec_obs").foreach { r =>
          observed = Some((r.getLong(0), r.getLong(1)))
        }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // two buckets: one of 3 (under cap → all 3 pairs), one of 40 (capped)
      val cap = 10
      val buckets = oneBucket(3).union(
        spark.range(40).select(
          lit(1).as("band"), lit("cafe").as("bkey"),
          format_string("x%05d", col("id")).as("doc_id")))
      val pairs = Lsh.cappedPairs(buckets, "doc_id", "a", "b",
        "graft_lsh_spec_obs", cap).collect()
      assert(pairs.length === 3 + cap * (cap - 1) / 2)
      // QueryExecutionListener delivery is async — poll briefly
      val deadline = System.currentTimeMillis + 30000
      while (observed.isEmpty && System.currentTimeMillis < deadline) Thread.sleep(50)
      assert(observed.contains((30L, 40L))) // dropped_ids, max_bucket
    } finally spark.listenerManager.unregister(listener)
  }

  test("clearCaches releases this session's persisted frames") {
    // handle-based (not global counts): parallel suites may persist their
    // own frames concurrently — only THIS frame's storage level matters
    val df = Text.all.find(_.name == "t6_minhash_lsh_neardup").get.fn(spark, sf0001)
    df.count()
    assert(df.storageLevel.useMemory || df.storageLevel.useDisk, "expected persisted")
    Text.clearCaches(spark)
    assert(df.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
  }

  test("cap engagement at sf0.1 scale: drops observed, kept subset exact") {
    // A skewed corpus the size of sf0.1 (5000 docs): 300 boilerplate
    // duplicates share one signature in every band (bucket of 300 > cap
    // 128), the rest are unique. Capped must NOT mean silently wrong:
    // the returned pairs must be EXACTLY the all-pairs ground truth of
    // the kept (lowest-id) subset, and the drop must be observable.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-skew").toString
    val boiler = "terms of service apply to all users and content provided " +
      "here without warranty of any kind whatsoever by the operator today"
    val nBoiler = 300
    val cap = Lsh.DefaultBucketCap // 128
    val docs =
      (0 until nBoiler).map(i => (i.toLong, boiler)) ++
        (0 until 4700).map(i =>
          (1000000L + i, (0 until 40).map(j => s"w${i}x$j").mkString(" ")))
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    @volatile var observed: Option[(Long, Long)] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        qe.observedMetrics.get("graft_lsh_text").foreach { r =>
          observed = Some((r.getLong(0), r.getLong(1)))
        }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val pairs = Text.all.find(_.name == "t6_minhash_lsh_neardup").get
        .fn(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // ground truth on the kept subset: every pair of the cap lowest ids
      val expected = (for {
        a <- 0 until cap; b <- (a + 1) until cap
      } yield (a.toLong, b.toLong)).toSet
      assert(pairs === expected,
        s"capped result must equal the uncapped ground truth of the kept " +
          s"subset (got ${pairs.size} pairs, expected ${expected.size})")
      val deadline = System.currentTimeMillis + 30000
      while (observed.isEmpty && System.currentTimeMillis < deadline) Thread.sleep(50)
      // 4 bands × (300 - 128) dropped ids; max bucket = the full pile-up
      assert(observed.contains((4L * (nBoiler - cap), nBoiler.toLong)))
    } finally {
      Text.clearCaches(spark)
      spark.listenerManager.unregister(listener)
    }
  }

  test("capping adds no exchange: one shuffle feeds window and groupBy") {
    // non-literal key columns (literals would constant-fold the window
    // partitioning away and make the plan SinglePartition)
    val buckets = spark.range(100).select(
      (col("id") % 2).cast("int").as("band"),
      format_string("k%d", col("id") % 2).as("bkey"),
      format_string("d%05d", col("id")).as("doc_id"))
    val plan = Lsh.cappedPairs(buckets, "doc_id", "a", "b",
      "graft_lsh_spec_plan", 8).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // 1 for (band,bkey) + 1 for the terminal distinct on (a,b)
    assert(exchanges === 2, s"unexpected exchange count in:\n$plan")
  }
}
