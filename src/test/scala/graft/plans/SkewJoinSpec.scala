package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The reference's known report skew: one simulation (or one gid) carrying
  * 100× the spikes of its siblings (SURVEY §4). Two join tiers handle it:
  *
  *  - the J4 window-assignment tier broadcasts the config-sized windows, so
  *    the event side is never hash-partitioned by a skewable key — probe
  *    skew is structurally irrelevant;
  *  - the J9 large-large tier (RangeJoin.binned) shuffles both sides by
  *    (keys, bucket) — a hot key is ordinary join skew, and AQE's
  *    skew-join split must engage.
  */
class SkewJoinSpec extends SparkSuite {

  /** 100×-skewed event table: gid 0 has 100k events, gids 1..49 have 1k. */
  private def skewed = {
    val hot = spark.range(100000).select(
      lit(0L).as("gid"), (col("id") % 1000).cast("double").as("t"))
    val rest = spark.range(49000).select(
      (col("id") % 49 + 1).as("gid"), (col("id") % 1000).cast("double").as("t"))
    hot.union(rest)
  }

  test("j9 path: AQE splits the hot partition of a 100x-skewed key") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k =>
      k -> scala.util.Try(conf.get(k)).toOption.filter(_ != null)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // scaled-down thresholds: the spec's hot partition is ~MBs, not the
      // 256 MB production default — the MECHANISM under test is the same
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "131072")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // both sides data-scale: no broadcast escape hatch
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      val intervals = spark.range(50).select(
        col("id").as("gid"), lit(0.0).as("lo"), lit(1000.0).as("hi"))
      val joined = RangeJoin.binned(skewed, "t", intervals, "lo", "hi", keys = Seq("gid"))
      // collect() executes THIS Dataset's own query execution (count()
      // would build a separate one and leave this adaptive plan unfinal);
      // every event falls inside its gid's single interval
      assert(joined.collect().length === 149000)
      // AQE finalized at execution: the hot (gid=0, bin) side must have
      // been recognized and split
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"no skew split in adaptive plan:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("j4 path: broadcast window assignment never shuffles the event side") {
    // the engine's report tier (Repository.report / Spikes.assigned shape):
    // config-sized windows broadcast against the skewed events
    val windows = spark.range(3).select(
      concat(lit("w"), col("id")).as("win"),
      (col("id") * 300).cast("double").as("lo"),
      ((col("id") + 1) * 300).cast("double").as("hi"))
    val assigned = skewed.join(
      broadcast(windows), col("t") >= col("lo") && col("t") < col("hi"))
    assert(assigned.count() > 0)
    val p = assigned.queryExecution.executedPlan.toString
    // no hash exchange anywhere: the only data movement is the broadcast
    // of the tiny window table, so a 100x-hot gid cannot create a hot
    // partition in this tier
    assert(!p.contains("Exchange hashpartitioning"), s"event-side shuffle in:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }
}
