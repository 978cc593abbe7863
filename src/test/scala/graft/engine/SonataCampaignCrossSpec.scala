package graft.engine

import graft.SparkSuite
import graft.dsl.{QAnd, QCond, QEq, QTrue}
import graft.sources.Hdf5Writer
import org.apache.spark.sql.DataFrame

/** End-to-end cross-check of the NATIVE SONATA path: the same 2-simulation
  * campaign analyzed once through SonataAdapter (spikes as real SONATA
  * HDF5 written by Hdf5Writer — one file per superblock generation) and
  * once through ParquetAdapter (the converted-format tier), asserting the
  * extracted repository report and every computed feature frame are
  * identical after sort. Mirrors the reference's functional analysis
  * equality test (tests/functional/test_analysis.py:156-170), which pins
  * the bluepysnap-read campaign against stored expectations.
  */
class SonataCampaignCrossSpec extends SparkSuite {

  private val circuitDir = "/root/reference/tests/unit/data/circuit/sonata"

  private def sortedRows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.head, cols.tail: _*)
      .collect().map(_.toString).sorted.toSeq
  }

  test("sonata .h5 campaign == parquet campaign: report and features") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cross").toString
    val rnd = new scala.util.Random(1234)

    // identical spike trains per simulation, gids in the 3-node circuit
    val sims = (0 until 2).map { i =>
      val times = Array.fill(200)(rnd.nextDouble() * 100.0).sorted
      val gids = Array.fill(200)(rnd.nextInt(3).toLong)
      (i, times, gids)
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/sonata"))
    sims.foreach { case (i, times, gids) =>
      // one sim per writer generation: superblock v0 and v2 both flow
      // through the whole engine, not just the reader spec
      if (i == 0)
        Hdf5Writer.writeSonataSpikes(s"$dir/sonata/sim$i.h5", "default", times, gids)
      else
        Hdf5Writer.writeSonataSpikesV2(s"$dir/sonata/sim$i.h5", "default", times, gids)
      times.zip(gids).toSeq.toDF("time", "gid")
        .write.mode("overwrite").parquet(s"$dir/pq/sim$i")
    }
    // shared node table: the SONATA circuit exported to parquet, so both
    // adapters see the same properties and class predicates
    val sonataNodes = new SonataAdapter(population = Some("default"))
    sonataNodes.nodes(spark, circuitDir)
      .write.mode("overwrite").parquet(s"$dir/pq/nodes")

    def campaign(paths: Int => String, circuit: String) = Campaign(
      name = "cross", pathPrefix = "", attrs = Map.empty,
      rows = (0 until 2).map(i => Map[String, Any](
        "simulation_path" -> paths(i), "circuit_path" -> circuit, "seed" -> (100 + i))))

    val cfg = SingleAnalysisConfig(
      name = "spikes",
      reportType = "spikes",
      windows = Map(
        "full" -> WindowSpec(bounds = (0.0, 100.0)),
        "early" -> WindowSpec(bounds = (0.0, 20.0), initialOffset = 10.0)),
      neuronClasses = Map(
        "all" -> NeuronClassSpec(query = QTrue),
        "L2" -> NeuronClassSpec(query = QAnd("mtype" -> QCond(QEq("L2_X"))))),
      features = Seq(FeaturesSpec(
        groupby = Seq("simulation_id", "circuit_id", "neuron_class", "window"),
        function = "mean_firing_rates")))

    val native = new Analyzer(spark, cfg,
      campaign(i => s"$dir/sonata/sim$i.h5", circuitDir),
      new SonataAdapter(population = Some("default")))
    val converted = new Analyzer(spark, cfg,
      campaign(i => s"$dir/pq/sim$i", s"$dir/pq/nodes"),
      new ParquetAdapter)

    val nativeReport = native.df("report")
    val convReport = converted.df("report")
    assert(nativeReport.columns.sorted.toSeq === convReport.columns.sorted.toSeq)
    val nr = sortedRows(nativeReport)
    assert(nr.nonEmpty)
    assert(nr === sortedRows(convReport))

    val nf = native.calculateFeatures()
    val cf = converted.calculateFeatures()
    assert(nf.keySet === cf.keySet && nf.nonEmpty)
    nf.keySet.foreach { k =>
      assert(sortedRows(nf(k)) === sortedRows(cf(k)), s"feature frame '$k' differs")
    }
  }

  test("sonata soma-report campaign == parquet frames campaign") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cross-soma").toString
    val rnd = new scala.util.Random(99)
    (0 until 2).foreach { i =>
      val simDir = java.nio.file.Paths.get(s"$dir/sonata/sim$i")
      java.nio.file.Files.createDirectories(simDir.resolve("reporting"))
      // 200 frames × 3 nodes on the grid t = r * 0.5, values random f32
      val data = Array.fill(200, 3)(rnd.nextFloat() * 10f)
      Hdf5Writer.writeSonataFrames(
        simDir.resolve("reporting/soma.h5").toString, "default",
        nodeIds = Array(0L, 1L, 2L), start = 0.0, step = 0.5, data = data)
      Hdf5Writer.writeSonataSpikes(
        simDir.resolve("reporting/spikes.h5").toString, "default",
        Array(1.0), Array(0L))
      java.nio.file.Files.writeString(simDir.resolve("simulation_config.json"),
        """{"output": {"output_dir": "reporting", "spikes_file": "spikes.h5"},
          | "reports": {"soma": {"file_name": "soma"}}}""".stripMargin)
      // identical long-form frames for the parquet side
      val rows = for { r <- 0 until 200; c <- 0 until 3 }
        yield (r * 0.5, c.toLong, data(r)(c).toDouble)
      rows.toDF("time", "gid", "value")
        .write.mode("overwrite").parquet(s"$dir/pq/sim$i")
    }
    new SonataAdapter(population = Some("default"))
      .nodes(spark, circuitDir)
      .write.mode("overwrite").parquet(s"$dir/pq/nodes")

    val cfg = SingleAnalysisConfig(
      name = "soma", reportType = "soma",
      windows = Map(
        "full" -> WindowSpec(bounds = (0.0, 100.0)),
        // t_step subsampling exercises the grid filter on both paths
        "coarse" -> WindowSpec(bounds = (10.0, 50.0), tStep = 2.0)),
      neuronClasses = Map("all" -> NeuronClassSpec(query = QTrue)),
      features = Nil)
    def campaign(paths: Int => String, circuit: String) = Campaign(
      name = "cross-soma", pathPrefix = "", attrs = Map.empty,
      rows = (0 until 2).map(i => Map[String, Any](
        "simulation_path" -> paths(i), "circuit_path" -> circuit)))
    val native = new Analyzer(spark, cfg,
      campaign(i => s"$dir/sonata/sim$i", circuitDir),
      new SonataAdapter(population = Some("default")))
    val converted = new Analyzer(spark, cfg,
      campaign(i => s"$dir/pq/sim$i", s"$dir/pq/nodes"),
      new ParquetAdapter)
    val nr = sortedRows(native.df("report"))
    assert(nr.nonEmpty)
    assert(nr === sortedRows(converted.df("report")))
  }

  test("sonata compartment-report campaign == parquet frames campaign (section column)") {
    // mirrors the reference's compartment analysis config
    // (tests/functional/data/sonata/config/analysis_config_06.yaml: a
    // report with per-section columns); writer → `sonata-frames` →
    // Repository vs the long-form parquet path, section column included
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cross-comp").toString
    val rnd = new scala.util.Random(7)
    // 3 nodes fanning to 7 columns: gid 0 → sections {0,1}, gid 1 →
    // {0,1}, gid 2 → {0,1,2} (index_pointers [0,2,4,7])
    val idx = Array(0L, 2L, 4L, 7L)
    val elems = Array(0L, 1L, 0L, 1L, 0L, 1L, 2L)
    val colGid = Array(0L, 0L, 1L, 1L, 2L, 2L, 2L)
    (0 until 2).foreach { i =>
      val simDir = java.nio.file.Paths.get(s"$dir/sonata/sim$i")
      java.nio.file.Files.createDirectories(simDir.resolve("reporting"))
      val data = Array.fill(100, 7)(rnd.nextFloat() * 10f)
      Hdf5Writer.writeSonataFrames(
        simDir.resolve("reporting/comp.h5").toString, "default",
        nodeIds = Array(0L, 1L, 2L), start = 0.0, step = 0.5, data = data,
        indexPointers = Some(idx), elementIds = Some(elems))
      Hdf5Writer.writeSonataSpikes(
        simDir.resolve("reporting/spikes.h5").toString, "default",
        Array(1.0), Array(0L))
      java.nio.file.Files.writeString(simDir.resolve("simulation_config.json"),
        """{"output": {"output_dir": "reporting", "spikes_file": "spikes.h5"},
          | "reports": {"comp": {"file_name": "comp"}}}""".stripMargin)
      val rows = for { r <- 0 until 100; c <- 0 until 7 }
        yield (r * 0.5, colGid(c), data(r)(c).toDouble, elems(c))
      rows.toDF("time", "gid", "value", "section")
        .write.mode("overwrite").parquet(s"$dir/pq/sim$i")
    }
    new SonataAdapter(population = Some("default"))
      .nodes(spark, circuitDir)
      .write.mode("overwrite").parquet(s"$dir/pq/nodes")

    val cfg = SingleAnalysisConfig(
      name = "comp", reportType = "compartment",
      windows = Map(
        "full" -> WindowSpec(bounds = (0.0, 50.0)),
        "coarse" -> WindowSpec(bounds = (5.0, 25.0), tStep = 2.0)),
      neuronClasses = Map(
        "all" -> NeuronClassSpec(query = QTrue),
        "L2" -> NeuronClassSpec(query = QAnd("mtype" -> QCond(QEq("L2_X"))))),
      features = Nil)
    def campaign(paths: Int => String, circuit: String) = Campaign(
      name = "cross-comp", pathPrefix = "", attrs = Map.empty,
      rows = (0 until 2).map(i => Map[String, Any](
        "simulation_path" -> paths(i), "circuit_path" -> circuit)))
    val native = new Analyzer(spark, cfg,
      campaign(i => s"$dir/sonata/sim$i", circuitDir),
      new SonataAdapter(population = Some("default")))
    val converted = new Analyzer(spark, cfg,
      campaign(i => s"$dir/pq/sim$i", s"$dir/pq/nodes"),
      new ParquetAdapter)
    val nativeReport = native.df("report")
    assert(nativeReport.columns.contains("section"),
      s"native compartment report lost the section column: ${nativeReport.columns.toSeq}")
    val nr = sortedRows(nativeReport)
    assert(nr.nonEmpty)
    assert(nr === sortedRows(converted.df("report")))
  }
}
