package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The sonata-spikes DSv2 source over the reference's real fixtures:
  * schema, correctness of the full scan, plan-time pushdowns (population
  * pruning, time-window row narrowing via the by_time sort), and in-reader
  * residual evaluation for the by_id population where narrowing is
  * unsound.
  */
class SonataSourceSpec extends SparkSuite {

  private val spikesH5 =
    "/root/reference/tests/unit/data/simulation/sonata/reporting/spikes.h5"

  private def read(rowsPerPartition: Long = 1) = spark.read
    .format("sonata-spikes")
    .option("rowsPerPartition", rowsPerPartition.toString)
    .load(spikesH5)

  test("full scan: both populations, exact rows") {
    val df = read()
    assert(df.columns.toSeq === Seq("population", "time", "gid"))
    val rows = df.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(rows.size === 10)
    assert(rows.filter(_._1 == "default") ===
      Set(("default", 0.1, 2L), ("default", 0.2, 0L), ("default", 0.3, 1L),
        ("default", 0.7, 2L), ("default", 1.3, 0L)))
    // by_id population holds the same spikes
    assert(rows.filter(_._1 == "default2").map(r => (r._2, r._3)) ===
      rows.filter(_._1 == "default").map(r => (r._2, r._3)))
  }

  test("population filter prunes partitions at planning") {
    val all = read()
    val one = read().filter(col("population") === "default")
    assert(all.rdd.getNumPartitions === 10) // 1 row per partition, 2 pops
    assert(one.rdd.getNumPartitions === 5)
    assert(one.count() === 5)
  }

  test("time window on a by_time population narrows the row range at planning") {
    val df = read().filter(
      col("population") === "default" && col("time") >= 0.2 && col("time") < 0.8)
    // rows [0.2, 0.3, 0.7] — the plan must contain exactly those 3
    // single-row partitions, found by binary search, not all 5
    assert(df.rdd.getNumPartitions === 3)
    assert(df.collect().map(r => (r.getDouble(1), r.getLong(2))).toSet ===
      Set((0.2, 0L), (0.3, 1L), (0.7, 2L)))
    // pushdown is visible in the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SonataSpikesScan pushed=["), plan)
  }

  test("same time window on the by_id population: no narrowing, same answer") {
    val df = read().filter(
      col("population") === "default2" && col("time") >= 0.2 && col("time") < 0.8)
    assert(df.rdd.getNumPartitions === 5) // cannot narrow an unsorted population
    assert(df.collect().map(r => (r.getDouble(1), r.getLong(2))).toSet ===
      Set((0.2, 0L), (0.3, 1L), (0.7, 2L)))
  }

  test("gid filters evaluate in the reader; column pruning works") {
    val df = read().filter(col("population") === "default" && col("gid") === 2)
      .select("time")
    assert(df.collect().map(_.getDouble(0)).toSet === Set(0.1, 0.7))
    val schema = "ReadSchema|readSchema"
    assert(df.queryExecution.executedPlan.toString.contains("SonataSpikesScan"), schema)
  }

  test("disjunctive time predicates stay residual and still answer correctly") {
    // Or() must NOT be treated as a narrowing window
    val df = read().filter(
      col("population") === "default" && (col("time") < 0.15 || col("time") > 1.0))
    assert(df.collect().map(_.getDouble(1)).toSet === Set(0.1, 1.3))
  }
}
