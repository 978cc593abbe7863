package graft.engine

import graft.SparkSuite
import graft.dsl.{QAnd, QCond, QEq, QTrue}
import graft.sources.Hdf5Writer
import org.apache.spark.sql.DataFrame

/** BlueConfigAdapter over the reference's GENUINE bluepy-tier fixtures
  * (tests/unit/data/simulation/bbp, tests/unit/data/circuit/bbp — real
  * h5py/BBP-tooling-written files, not our own writer round-tripping):
  * config parse, 1-based gid conventions, the legacy flat report layout
  * through `sonata-frames`, MVD3 library resolution, and .target
  * resolution — then a writer-built consistent campaign cross-checked
  * against the parquet tier end-to-end.
  */
class BlueConfigAdapterSpec extends SparkSuite {

  private val simDir = "/root/reference/tests/unit/data/simulation/bbp"
  private val circuitDir = "/root/reference/tests/unit/data/circuit/bbp"
  private val adapter = new BlueConfigAdapter()

  private def sortedRows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.head, cols.tail: _*)
      .collect().map(_.toString).sorted.toSeq
  }

  test("BlueConfig parse: Run + Report stanzas") {
    val sections = BlueConfig.parse(s"$simDir/BlueConfig")
    assert(sections.map(s => (s.kind, s.name)) ===
      Seq(("Run", "Default"), ("Report", "soma"), ("Report", "AllCompartments")))
    val run = sections.head.entries
    assert(run("OutputRoot") === "reporting")
    assert(run("CellLibraryFile") === "../../circuit/bbp/circuit.mvd3")
    val soma = sections(1).entries
    assert(soma("Type") === "compartment" && soma("Dt") === "0.1")
  }

  test("spikes: SONATA out.h5 with bluepy 1-based gids (node_id + 1)") {
    assert(adapter.isComplete(s"$simDir/BlueConfig"))
    val rows = adapter.spikes(spark, s"$simDir/BlueConfig")
      .orderBy("time").collect()
    assert(rows.length === 6)
    // genuine file: node_ids [21,32,10,10,32,21] at the sorted times —
    // the adapter shifts every id by +1 (bluepy GID convention)
    assert(rows.map(_.getLong(1)).toSeq === Seq(22L, 33L, 11L, 11L, 33L, 22L))
    assert(rows.head.getDouble(0) === 1.0e-6)
    assert(rows.last.getDouble(0) === 10000.000001)
  }

  test("frames: legacy flat layout, soma-shaped (no section column)") {
    val df = adapter.frames(spark, s"$simDir/BlueConfig")
    assert(df.columns.toSeq === Seq("time", "gid", "value"))
    // 100 frames × 50 gid columns on the t = 0.1·r grid
    assert(df.count() === 5000)
    val gids = df.select("gid").distinct().collect().map(_.getLong(0)).sorted
    assert(gids.length === 50 && gids.head === 10L && gids.last === 841L)
    val t0 = df.filter("time = 0.0 and gid = 10").collect()
    assert(t0.length === 1)
    // value pinned to the genuine file's data[0][0] (f32 → double)
    assert(math.abs(t0.head.getDouble(2) - (-65.04297637939453)) < 1e-12)
    val times = df.select("time").distinct().collect().map(_.getDouble(0))
    assert(times.length === 100 && math.abs(times.max - 9.9) < 1e-9)
  }

  test("frames: time pushdown collapses planned legacy rows") {
    import graft.sources.SonataFrameSlice
    // plan through the public reader path, then count planned frame rows
    val narrow = adapter.frames(spark, s"$simDir/BlueConfig")
      .filter("time >= 5.0 and time < 5.3")
    assert(narrow.count() === 3 * 50)
    val planned = narrow.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.partitions.flatten.collect { case p: SonataFrameSlice => p.r1 - p.r0 }.sum
      }).sum
    assert(planned <= 5L, s"narrow window planned $planned of 100 frame rows")
  }

  test("nodes: MVD3 with library resolution, 1-based gids, positions") {
    val df = adapter.nodes(spark, circuitDir)
    val rows = df.orderBy("gid").collect()
    assert(rows.length === 3)
    val byName = df.columns.zipWithIndex.toMap
    assert(rows.map(_.getLong(byName("gid"))).toSeq === Seq(1L, 2L, 3L))
    assert(rows.map(_.getString(byName("mtype"))).toSeq === Seq("L2_X", "L6_Y", "L6_Y"))
    assert(rows.map(_.getString(byName("etype"))).toSeq === Seq("bNA", "bNA", "cNA"))
    assert(rows.map(_.getString(byName("morphology"))).toSeq ===
      Seq("morph-A", "morph-B", "morph-C"))
    assert(rows.map(_.getString(byName("me_combo"))).toSeq ===
      Seq("me-combo-A", "me-combo-B", "me-combo-C"))
    assert(rows.map(_.getLong(byName("layer"))).toSeq === Seq(2L, 6L, 6L))
    assert(rows.map(_.getDouble(byName("x"))).toSeq === Seq(101.0, 201.0, 301.0))
    assert(rows.map(_.getDouble(byName("z"))).toSeq === Seq(103.0, 203.0, 303.0))
    // same table reachable from the simulation's BlueConfig
    assert(sortedRows(adapter.nodes(spark, s"$simDir/BlueConfig")) === sortedRows(df))
  }

  test("spikes: legacy out.dat text format (already-1-based gids)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-outdat")
    java.nio.file.Files.createDirectories(dir.resolve("reporting"))
    java.nio.file.Files.writeString(dir.resolve("BlueConfig"),
      "Run Default\n{\n    OutputRoot reporting\n}\n")
    java.nio.file.Files.writeString(dir.resolve("reporting/out.dat"),
      "/scatter\n0.5 2\n1.25 1\n3.0 2\n")
    val rows = adapter.spikes(spark, dir.resolve("BlueConfig").toString)
      .orderBy("time").collect()
    assert(rows.map(r => (r.getDouble(0), r.getLong(1))).toSeq ===
      Seq((0.5, 2L), (1.25, 1L), (3.0, 2L)))
    // out.dat wins over out.h5 when both exist (bluepy path resolution)
    assert(adapter.isComplete(dir.resolve("BlueConfig").toString))
  }

  test("frames: compartment-shaped legacy report emits the section column") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bbp-comp")
    java.nio.file.Files.createDirectories(dir.resolve("reporting"))
    java.nio.file.Files.writeString(dir.resolve("BlueConfig"),
      "Run Default\n{\n    OutputRoot reporting\n}\n" +
        "Report comp\n{\n    Type compartment\n    Dt 0.5\n}\n")
    // 2 gids fanning to 5 columns: gid 1 → sections {0,1}, gid 2 → {0,1,2}
    val data = Array.tabulate(4, 5)((r, c) => (r * 10 + c).toFloat)
    graft.sources.Hdf5Writer.writeBbpReport(
      dir.resolve("reporting/comp.h5").toString,
      gids = Array(1L, 2L), start = 0.0, step = 0.5, data = data,
      indexPointer = Some(Array(0L, 2L)),
      elementId = Some(Array(0L, 1L, 0L, 1L, 2L)))
    val df = adapter.frames(spark, dir.resolve("BlueConfig").toString)
    assert(df.columns.toSeq === Seq("time", "gid", "value", "section"))
    assert(df.count() === 20)
    val r = df.filter("time = 1.0 and gid = 2 and section = 2").collect()
    assert(r.length === 1 && r.head.getDouble(2) === 24.0)
    assert(df.filter("gid = 1").count() === 8) // 2 columns × 4 frames
  }

  test("targets: start.target a<gid> entries resolve to 1-based gid sets") {
    val ts = BlueConfig.targets(s"$circuitDir/start.target")
    assert(ts("All") === Seq(1L, 2L, 3L))
    assert(ts("LFPCompartments") === Seq(1L, 2L))
    // the genuine fixture's `CircuitPath .` points at the sim dir (no
    // start.target there) → resolves to no targets, not an error
    assert(adapter.targets(s"$simDir/BlueConfig") === Map.empty)
    // via a simulation config whose CircuitPath holds start.target
    val dir = java.nio.file.Files.createTempDirectory("graft-tgt-sim")
    java.nio.file.Files.writeString(dir.resolve("BlueConfig"),
      s"Run Default\n{\n    CircuitPath $circuitDir\n    OutputRoot .\n}\n")
    val fromSim = adapter.targets(dir.resolve("BlueConfig").toString)
    assert(fromSim("All") === Seq(1L, 2L, 3L))
  }

  test("targets: nested target references resolve recursively") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tgt")
    val f = dir.resolve("user.target")
    java.nio.file.Files.writeString(f,
      """Target Cell Base
        |{
        |  a5 a7
        |}
        |Target Cell Extra
        |{
        |  Base a9
        |}
        |""".stripMargin)
    val ts = BlueConfig.targets(f.toString)
    assert(ts("Extra") === Seq(5L, 7L, 9L))
  }

  test("bluepy BlueConfig campaign == parquet campaign: report and features") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cross-bbp").toString
    val rnd = new scala.util.Random(41)

    // two sims over the GENUINE 3-cell mvd3 circuit (gids 1..3): writer
    // builds a consistent legacy campaign — SONATA out.h5 spikes
    // (node_ids = gid - 1) + a legacy flat soma report
    (0 until 2).foreach { i =>
      val sim = java.nio.file.Paths.get(s"$dir/bbp/sim$i")
      java.nio.file.Files.createDirectories(sim.resolve("reporting"))
      val times = Array.fill(150)(rnd.nextDouble() * 100.0).sorted
      val gids = Array.fill(150)(rnd.nextInt(3) + 1L)
      Hdf5Writer.writeSonataSpikes(
        sim.resolve("reporting/out.h5").toString, "default",
        times, gids.map(_ - 1))
      val data = Array.fill(120, 3)(rnd.nextFloat() * 10f)
      Hdf5Writer.writeBbpReport(
        sim.resolve("reporting/soma.h5").toString,
        gids = Array(1L, 2L, 3L), start = 0.0, step = 0.5, data = data,
        indexPointer = Some(Array(0L, 1L, 2L)))
      java.nio.file.Files.writeString(sim.resolve("BlueConfig"),
        s"""Run Default
           |{
           |    CircuitPath $circuitDir
           |    CellLibraryFile $circuitDir/circuit.mvd3
           |    OutputRoot reporting
           |}
           |
           |Report soma
           |{
           |    Target All
           |    Type compartment
           |    ReportOn v
           |    Dt 0.5
           |}
           |""".stripMargin)
      // identical long-form tables for the parquet tier
      times.zip(gids).toSeq.toDF("time", "gid")
        .write.mode("overwrite").parquet(s"$dir/pq/spikes$i")
      val frameRows = for { r <- 0 until 120; c <- 0 until 3 }
        yield (r * 0.5, c + 1L, data(r)(c).toDouble)
      frameRows.toDF("time", "gid", "value")
        .write.mode("overwrite").parquet(s"$dir/pq/frames$i")
    }
    val bluepy = new BlueConfigAdapter()
    bluepy.nodes(spark, circuitDir)
      .write.mode("overwrite").parquet(s"$dir/pq/nodes")

    def campaign(paths: Int => String, circuit: String) = Campaign(
      name = "cross-bbp", pathPrefix = "", attrs = Map.empty,
      rows = (0 until 2).map(i => Map[String, Any](
        "simulation_path" -> paths(i), "circuit_path" -> circuit)))
    def cfg(reportType: String) = SingleAnalysisConfig(
      name = reportType, reportType = reportType,
      windows = Map(
        "full" -> WindowSpec(bounds = (0.0, 100.0)),
        "early" -> WindowSpec(bounds = (0.0, 20.0))),
      neuronClasses = Map(
        "all" -> NeuronClassSpec(query = QTrue),
        "L2" -> NeuronClassSpec(query = QAnd("mtype" -> QCond(QEq("L2_X"))))),
      features = if (reportType == "spikes") Seq(FeaturesSpec(
        groupby = Seq("simulation_id", "circuit_id", "neuron_class", "window"),
        function = "mean_firing_rates")) else Nil)

    // spikes tier
    val native = new Analyzer(spark, cfg("spikes"),
      campaign(i => s"$dir/bbp/sim$i/BlueConfig", circuitDir), bluepy)
    val conv = new Analyzer(spark, cfg("spikes"),
      campaign(i => s"$dir/pq/spikes$i", s"$dir/pq/nodes"), new ParquetAdapter)
    val nr = sortedRows(native.df("report"))
    assert(nr.nonEmpty)
    assert(nr === sortedRows(conv.df("report")))
    val nf = native.calculateFeatures()
    val cf = conv.calculateFeatures()
    assert(nf.keySet === cf.keySet && nf.nonEmpty)
    nf.keySet.foreach { k =>
      assert(sortedRows(nf(k)) === sortedRows(cf(k)), s"feature frame '$k' differs")
    }

    // soma tier (the legacy flat report through sonata-frames)
    val nativeSoma = new Analyzer(spark, cfg("soma"),
      campaign(i => s"$dir/bbp/sim$i/BlueConfig", circuitDir), bluepy)
    val convSoma = new Analyzer(spark, cfg("soma"),
      campaign(i => s"$dir/pq/frames$i", s"$dir/pq/nodes"), new ParquetAdapter)
    val ns = sortedRows(nativeSoma.df("report"))
    assert(ns.nonEmpty)
    assert(ns === sortedRows(convSoma.df("report")))
  }
}
