package graft.engine

import graft.SparkSuite
import graft.dsl.QTrue
import graft.sources.{Hdf5Writer, SonataFrameSlice}
import org.apache.spark.sql.functions._

/** End-to-end time pushdown on the NATIVE frame path: a Repository
  * extraction over a synthetic 50k-frame soma report must plan (and
  * therefore decode) only the analysis windows' slab of the data matrix —
  * the engine's static-window envelope prefilter reaching the
  * sonata-frames DSv2 source as a plan-time row-range collapse, the
  * chain the reference implements by passing t_start/t_stop into
  * bluepysnap (adapters/impl/bluepysnap/simulation.py:42-60).
  */
class FramesPushdownE2ESpec extends SparkSuite {

  private def simDir(nFrames: Int, nCols: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-frames-e2e")
    java.nio.file.Files.createDirectories(dir.resolve("reporting"))
    // data[r][c] = r + c/100, grid t = r * 0.1
    val data = Array.tabulate(nFrames, nCols)((r, c) => (r + c / 100.0f).toFloat)
    Hdf5Writer.writeSonataFrames(
      dir.resolve("reporting/soma.h5").toString, "default",
      nodeIds = Array.tabulate(nCols)(_.toLong), start = 0.0, step = 0.1, data = data)
    Hdf5Writer.writeSonataSpikes(
      dir.resolve("reporting/spikes.h5").toString, "default",
      Array(1.0, 2.0), Array(0L, 1L))
    java.nio.file.Files.writeString(dir.resolve("simulation_config.json"),
      """{"output": {"output_dir": "reporting", "spikes_file": "spikes.h5"},
        | "reports": {"soma": {"file_name": "soma"}}}""".stripMargin)
    dir.toString
  }

  test("synthetic 50k-frame report: writer round-trips through the source") {
    val dir = simDir(nFrames = 50000, nCols = 4)
    val a = new SonataAdapter(population = Some("default"))
    val df = a.frames(spark, dir)
    assert(df.columns.toSeq === Seq("time", "gid", "value")) // soma: no section
    assert(df.count() === 50000L * 4)
    val probe = df.filter(col("time") >= 4999.0 && col("time") < 4999.2)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
    assert(probe.length === 8) // 2 frames × 4 nodes
    val at = probe.filter(t => math.abs(t._1 - 4999.0) < 1e-9 && t._2 == 2L)
    assert(at.length === 1 && math.abs(at.head._3 - 49990.02) < 0.5) // f32 precision
  }

  test("a narrow probe plans only the window's slabs out of 50k frames") {
    val dir = simDir(nFrames = 50000, nCols = 4)
    val a = new SonataAdapter(population = Some("default"))
    val probe = a.frames(spark, dir).filter(col("time") >= 100.0 && col("time") < 100.5)
    val slices = probe.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.partitions.flatten.collect { case s: SonataFrameSlice => s }
      }).flatten
    val planned = slices.map(s => s.r1 - s.r0).sum
    assert(planned > 0 && planned <= 10,
      s"planned $planned frame rows for a 5-row window out of 50000")
    assert(probe.count() === 5L * 4)
  }

  test("Repository extraction pushes the static window envelope into the scan") {
    val dir = simDir(nFrames = 50000, nCols = 4)
    val campaign = Campaign(
      name = "frames-e2e", pathPrefix = "", attrs = Map.empty,
      rows = Seq(Map[String, Any]("simulation_path" -> dir, "circuit_path" -> dir)))
    val cfg = SingleAnalysisConfig(
      name = "soma", reportType = "soma",
      windows = Map("w" -> WindowSpec(bounds = (200.0, 200.4))),
      neuronClasses = Map("all" -> NeuronClassSpec(query = QTrue)),
      features = Nil)
    // nodes: the same gids as the report columns, via a tiny parquet table
    import spark.implicits._
    val nodesDir = java.nio.file.Files.createTempDirectory("graft-frames-nodes").toString
    (0L until 4L).toDF("gid").write.mode("overwrite").parquet(nodesDir)
    val adapter = new SonataAdapter(population = Some("default")) {
      override def nodes(s: org.apache.spark.sql.SparkSession, p: String) =
        s.read.parquet(nodesDir)
    }
    val repo = new Repository(spark, campaign, cfg, adapter)
    val report = repo.report
    // the plan's frame scan carries the pushed envelope bounds
    val leaves = report.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val scan = leaves.find(_.contains("SonataFramesScan")).getOrElse(
      fail(s"no SonataFramesScan leaf in:\n${leaves.mkString("\n")}"))
    assert(scan.contains("GreaterThanOrEqual(time,200.0)"), scan)
    assert(scan.contains("LessThan(time,200.4)"), scan)
    // and the result is exactly the window's rows
    val rows = report.collect()
    assert(rows.length === 4 * 4) // 4 frames in [200, 200.4) × 4 gids
    assert(rows.forall(r => r.getAs[Double]("time") >= 200.0 &&
      r.getAs[Double]("time") < 200.4))
  }
}
