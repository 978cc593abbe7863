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
