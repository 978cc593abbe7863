package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, In, LessThan}
import org.apache.spark.sql.types.StructType

/** The sonata-frames DSv2 source against the reference's real h5py-written
  * frame reports: plan-time time-window pushdown (the planned row ranges —
  * hence the decoded slabs — collapse to the probed window), gid → column
  * -run pruning, residual exactness, and column pruning. The reference
  * pushes t_start/t_stop into its reader the same way
  * (adapters/impl/bluepysnap/simulation.py:42-60).
  */
class SonataFramesSourceSpec extends SparkSuite {

  private val somaH5 =
    "/root/reference/tests/unit/data/simulation/sonata/reporting/soma_report.h5"
  private val compH5 =
    "/root/reference/tests/unit/data/simulation/sonata/reporting/compartment_named.h5"

  // both fixtures hold populations default + default2 with the same shape;
  // plan() pins to default so row counts stay single-population
  private def plan(
      file: String,
      filters: Array[org.apache.spark.sql.sources.Filter],
      pruneRatio: Int = 4): Seq[SonataFrameSlice] =
    new SonataFramesScan(file, Some("default"), 4L * 1024 * 1024, pruneRatio, filters,
      SonataFramesSource.schema)
      .planInputPartitions().toSeq.map(_.asInstanceOf[SonataFrameSlice])

  test("time pushdown: a narrow probe plans only the window's frame rows") {
    // soma_report: 10 frames on the grid t = 0.0 + r*0.1
    val all = plan(somaH5, Array.empty)
    assert(all.map(s => s.r1 - s.r0).sum === 10)
    val probe = plan(somaH5,
      Array(GreaterThanOrEqual("time", 0.3), LessThan("time", 0.5)))
    val rows = probe.map(s => s.r1 - s.r0).sum
    // exact window is rows [3, 5); the plan may keep a one-row conservative
    // margin each side but must NOT keep the whole matrix
    assert(rows >= 2 && rows <= 4, s"planned $rows rows for a 2-row window")
    assert(probe.forall(s => s.r0 >= 2 && s.r1 <= 6))
  }

  test("time pushdown beyond the report span plans nothing (or a margin row)") {
    val probe = plan(somaH5, Array(GreaterThanOrEqual("time", 100.0)))
    assert(probe.map(s => s.r1 - s.r0).sum <= 1)
  }

  test("gid pushdown: a narrow In prunes to the owning column runs") {
    // compartment_named: 7 columns, index_pointers [0,2,4,7] — gid 1 owns
    // columns [2,4); pruneRatio 1 admits any narrower-than-full selection
    val probe = plan(compH5, Array(In("gid", Array(1L))), pruneRatio = 1)
    assert(probe.nonEmpty)
    assert(probe.forall(_.runs.contains(Seq((2L, 4L)))))
    // adjacent gids merge into one run
    val merged = plan(compH5, Array(In("gid", Array(0L, 1L))), pruneRatio = 1)
    assert(merged.forall(_.runs.contains(Seq((0L, 4L)))))
    // a gid filter admitting nothing plans zero partitions
    assert(plan(compH5, Array(EqualTo("gid", 99L)), pruneRatio = 1).isEmpty)
  }

  test("filtered reads equal the unfiltered read filtered in memory") {
    def read() = spark.read.format("sonata-frames")
      .option("population", "default").option("colpruneratio", "1").load(compH5)
    val full = read()
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    assert(full.size === 70) // 10 frames × 7 columns

    val timeProbe = read()
      .filter(col("time") >= 0.3 && col("time") < 0.5)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    assert(timeProbe === full.filter(t => t._2 >= 0.3 && t._2 < 0.5))
    assert(timeProbe.size === 14) // 2 frames × 7 columns

    val gidProbe = read()
      .filter(col("gid") === 2)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    assert(gidProbe === full.filter(_._3 == 2L))
    assert(gidProbe.size === 30) // 10 frames × 3 columns (4..6)

    val both = read()
      .filter(col("gid") === 0 && col("time") < 0.2)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    assert(both === full.filter(t => t._3 == 0L && t._2 < 0.2))
  }

  test("column pruning: a count-only plan never decodes the data matrix") {
    // prune to zero columns of interest: planInputPartitions still covers
    // the rows, and the reader path with value absent reads mapping only —
    // verified by the schema of the scan and the row count
    val df = spark.read.format("sonata-frames")
      .option("population", "default").load(somaH5).select("time")
    assert(df.count() === 30)
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scan.contains("value") || scan.contains("time"))
  }

  test("pushed filters appear in the scan description") {
    val df = spark.read.format("sonata-frames").load(somaH5)
      .filter(col("time") >= 0.3 && col("time") < 0.5)
    val leaf = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(leaf.contains("SonataFramesScan"))
    assert(leaf.contains("GreaterThanOrEqual(time,0.3)"))
  }

  test("population column and filter work through the engine schema") {
    val df = spark.read.format("sonata-frames").load(somaH5)
      .filter(col("population") === "default")
    assert(df.select("population").distinct().collect().map(_.getString(0)).toSeq ===
      Seq("default"))
    assert(plan(somaH5, Array(EqualTo("population", "nope"))).isEmpty)
  }

  test("gid run pruning shrinks planned byte volume; sections survive the pruned path") {
    // compartment_named mapping: node_ids [0,1,2], index_pointers [0,2,4,7],
    // element_ids give each column its section — read them straight from the
    // file so the expectation can't drift from the fixture
    val h5 = new Hdf5File(compH5)
    val es = h5.elemSize("/report/default/data")
    val idx = h5.readLongs("/report/default/mapping/index_pointers")
    val elems = h5.readLongs("/report/default/mapping/element_ids")
    val nCols = h5.dims("/report/default/data")(1)
    h5.close()

    def plannedBytes(slices: Seq[SonataFrameSlice]): Long =
      slices.map(s => (s.r1 - s.r0) *
        s.runs.map(_.map { case (a, b) => b - a }.sum).getOrElse(nCols) * es).sum

    val full = plannedBytes(plan(compH5, Array.empty))
    val narrow = plannedBytes(plan(compH5, Array(In("gid", Array(1L))), pruneRatio = 1))
    // gid 1 owns 2 of 7 columns → byte volume must shrink by ≥ the same ratio
    assert(narrow > 0 && narrow * 3 <= full,
      s"narrow plan reads $narrow bytes vs full $full — runs not pruning bytes")

    // the pruned read still fans columns to the right (gid, section, value)
    def read() = spark.read.format("sonata-frames")
      .option("population", "default").option("colpruneratio", "1").load(compH5)
    val pruned = read().filter(col("gid") === 1)
      .select("time", "section", "value").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2))).toSet
    val expectSections = (idx(1) until idx(2)).map(c => elems(c.toInt)).toSet
    assert(pruned.map(_._2) === expectSections)
    assert(pruned.size === 20) // 10 frames × 2 owned columns
    val unpruned = read().collect()
      .filter(_.getLong(2) == 1L)
      .map(r => (r.getDouble(1), r.getLong(4), r.getDouble(3))).toSet
    assert(pruned === unpruned)
  }

  test("run merging helper") {
    assert(SonataFramesSource.mergeRuns(Seq((4L, 7L), (0L, 2L), (2L, 4L))) ===
      Seq((0L, 7L)))
    assert(SonataFramesSource.mergeRuns(Seq((5L, 6L), (0L, 2L))) ===
      Seq((0L, 2L), (5L, 6L)))
    assert(SonataFramesSource.mergeRuns(Nil) === Nil)
  }
}
