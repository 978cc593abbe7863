package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Cluster-shape smoke: the local[4] test default (4 shuffle partitions,
  * localCheckpoint) hides two cluster-only failure modes — a reliable
  * checkpoint dir switching CC to fault-tolerant checkpoints, and
  * `spark.sql.shuffle.partitions` ≫ cores multiplying every stage's task
  * count. Both paths must produce identical results with a flat action
  * count (CC's one-action-per-round contract must not degrade into
  * per-partition or per-round extra jobs as parallelism grows).
  */
class ClusterShapeSpec extends SparkSuite {

  private def jobsFor(group: String)(body: => Unit): Int = {
    val sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try body finally sc.clearJobGroup()
    sc.statusTracker.getJobIdsForGroup(group).length
  }

  private def ccLabels(): Map[Long, Long] = {
    import spark.implicits._
    // 5 components of 20 vertices, chain edges, symmetric
    val vertices = spark.range(100).toDF("id")
    val edges = spark.range(99).filter(col("id") % 20 =!= 19)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val sym = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
    ConnectedComponents.minLabel(vertices, "id", sym)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("CC: reliable checkpoint + shuffle.partitions >> cores, flat actions") {
    val sc = spark.sparkContext
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    try {
      sc.setCheckpointDir(ckpt)
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      var low: Map[Long, Long] = null
      val jobsLow = jobsFor("cc-low") { low = ccLabels() }
      spark.conf.set("spark.sql.shuffle.partitions", "256")
      var high: Map[Long, Long] = null
      val jobsHigh = jobsFor("cc-high") { high = ccLabels() }
      // identical labels: every vertex maps to its 20-block base
      assert(high === low)
      assert(high(37L) === 20L && high(99L) === 80L && high(0L) === 0L)
      // flat actions: parallelism must scale task width, never job count
      assert(jobsHigh === jobsLow,
        s"job count grew with shuffle partitions: $jobsLow -> $jobsHigh")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      sc.setCheckpointDir(null)
    }
  }

  test("IVF v7 probe: identical result and pruned scan at 256 partitions") {
    val q = graft.queries.Vectors.all.find(_.name == "v7_ivf_persisted").get
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def rows() = q.fn(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    try {
      val base = rows()
      assert(base.nonEmpty)
      spark.conf.set("spark.sql.shuffle.partitions", "256")
      assert(rows() === base)
      // the probe's corpus scan keeps its cell partition filter — search
      // cost stays proportional to probed cells, not shuffle width
      val plan = q.fn(spark, sf0001).queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cell"))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
