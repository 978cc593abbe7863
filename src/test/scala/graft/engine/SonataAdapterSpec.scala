package graft.engine

import graft.SparkSuite
import graft.dsl.QTrue
import org.apache.spark.sql.functions._

/** SonataAdapter over the reference's real SONATA fixtures: config
  * resolution (manifest vars), spikes through the DSv2 source, soma and
  * compartment frame decoding, node tables with @library/vlen strings,
  * and a full Repository extraction over the doc simulation campaign —
  * the day-one path of a real blueetl user (.h5 campaign in, analysis
  * out) with no conversion step.
  */
class SonataAdapterSpec extends SparkSuite {

  private val simDir = "/root/reference/tests/unit/data/simulation/sonata"
  private val circuitDir = "/root/reference/tests/unit/data/circuit/sonata"
  private val docCampaign = "/root/reference/doc/source/data/simulation-campaign"
  private val docCircuit = "/root/reference/doc/source/data/circuit/circuit_config.json"

  test("spikes: sim dir → config → reporting/spikes.h5, both or one population") {
    val all = new SonataAdapter().spikes(spark, simDir)
    assert(all.columns.toSeq === Seq("time", "gid"))
    assert(all.count() === 10)
    val one = new SonataAdapter(population = Some("default")).spikes(spark, simDir)
    assert(one.collect().map(r => (r.getDouble(0), r.getLong(1))).toSet ===
      Set((0.1, 2L), (0.2, 0L), (0.3, 1L), (0.7, 2L), (1.3, 0L)))
  }

  test("status: complete when the spikes file exists, missing otherwise") {
    val a = new SonataAdapter()
    assert(a.status(simDir) === "COMPLETE")
    assert(a.status("/no/such/simulation") === "MISSING")
  }

  test("soma report: long form (time, gid, value) at the mapping grid") {
    val a = new SonataAdapter(population = Some("default"), reportName = Some("soma_report"))
    val df = a.frames(spark, simDir)
    assert(df.columns.toSeq === Seq("time", "gid", "value")) // soma: no section
    assert(df.count() === 30) // 10 frames × 3 nodes
    // data[t][i] = i + t/10 in f32 (validated byte-level in Hdf5Spec)
    val at01 = df.filter(abs(col("time") - 0.1) < 1e-9)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(at01.keySet === Set(0L, 1L, 2L))
    assert(math.abs(at01(1L) - 1.1) < 1e-6)
    // every node appears at every frame
    val counts = df.groupBy("gid").count().collect().map(r => r.getLong(1)).toSet
    assert(counts === Set(10L))
  }

  test("compartment report: index_pointers fan columns out to sections") {
    val a = new SonataAdapter(population = Some("default"), reportName = Some("section_report"))
    val df = a.frames(spark, simDir)
    assert(df.columns.toSeq === Seq("time", "gid", "value", "section"))
    assert(df.count() === 70) // 10 frames × 7 columns
    // node 2 owns columns 4..6 with element ids (0, 1, 1)
    val n2 = df.filter(col("gid") === 2 && abs(col("time")) < 1e-9)
      .collect().map(_.getLong(3)).sorted.toSeq
    assert(n2 === Seq(0L, 1L, 1L))
  }

  test("nodes: numeric + @library/vlen strings + dynamics params, per population") {
    val df = new SonataAdapter(population = Some("default")).nodes(spark, circuitDir)
    assert(df.count() === 3)
    val r = df.filter(col("gid") === 0).collect()(0)
    assert(r.getAs[String]("mtype") === "L2_X")
    assert(r.getAs[String]("model_type") === "biophysical")
    assert(r.getAs[Double]("layer") === 2.0)
    assert(r.getAs[Double]("x") === 101.0)
    assert(r.getAs[Double]("dynamics_params_holding_current") === 0.1)
  }

  test("manifest: prefix-colliding variables resolve longest-first") {
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest")
    java.nio.file.Files.createDirectories(dir.resolve("reporting"))
    graft.sources.Hdf5Writer.writeSonataSpikes(
      dir.resolve("reporting/spikes.h5").toString, "default",
      Array(1.0, 2.0), Array(0L, 1L))
    // $OUT vs $OUT_DIR: unordered-map iteration must not mangle $OUT_DIR
    // into "<out>_DIR" (a valid bluepysnap config shape)
    java.nio.file.Files.writeString(dir.resolve("simulation_config.json"),
      s"""{"manifest": {"$$OUT": "/nonexistent", "$$OUT_DIR": "$dir/reporting"},
         | "output": {"output_dir": "$$OUT_DIR", "spikes_file": "spikes.h5"}}""".stripMargin)
    val a = new SonataAdapter(population = Some("default"))
    assert(a.spikesFile(dir.toString) === s"$dir/reporting/spikes.h5")
    assert(a.spikes(spark, dir.toString).count() === 2)
  }

  test("nodes: the read distributes into row-range slab tasks (no driver build)") {
    // force ~1-row slices: the 3-node fixture must plan 3 partitions, each
    // task slab-reading its own row range — the shape that holds at
    // millions of nodes (driver touches metadata + @library only)
    val tiny = new SonataAdapter(population = Some("default"), nodeSliceBytes = 8L)
    val df = tiny.nodes(spark, circuitDir)
    assert(df.rdd.getNumPartitions >= 3)
    val rows = df.orderBy("gid").collect()
    assert(rows.length === 3)
    assert(rows(0).getAs[String]("mtype") === "L2_X")
    assert(rows.map(_.getAs[Long]("gid")).toSeq === Seq(0L, 1L, 2L))
    // slab-partitioned result equals the default-sliced result
    val whole = new SonataAdapter(population = Some("default")).nodes(spark, circuitDir)
    assert(whole.orderBy("gid").collect().map(_.toString).toSeq ===
      rows.map(_.toString).toSeq)
  }

  test("nodes: a population filter matching nothing fails with a clear error") {
    val e = intercept[IllegalArgumentException] {
      new SonataAdapter(population = Some("no_such_pop")).nodes(spark, circuitDir)
    }
    assert(e.getMessage.contains("no_such_pop"))
    assert(e.getMessage.contains("default")) // lists what IS available
  }

  test("end-to-end: doc .h5 campaign extracts through the Repository unconverted") {
    val campaign = Campaign(
      name = "doc-campaign",
      pathPrefix = docCampaign,
      attrs = Map.empty,
      rows = Seq(
        Map("simulation_path" -> "0", "circuit_path" -> docCircuit, "seed" -> 334630),
        Map("simulation_path" -> "1", "circuit_path" -> docCircuit, "seed" -> 174404)))
    val cfg = SingleAnalysisConfig(
      name = "spikes",
      reportType = "spikes",
      windows = Map("full" -> WindowSpec(bounds = (0.0, 100.0))),
      neuronClasses = Map("all" -> NeuronClassSpec(query = QTrue)),
      features = Nil)
    val repo = new Repository(
      spark, campaign, cfg, new SonataAdapter(population = Some("thalamus_neurons")))
    assert(repo.simulations.count() === 2)
    repo.validateWindows()
    val report = repo.report
    assert(report.columns.toSeq ===
      Seq("simulation_id", "circuit_id", "neuron_class", "window", "trial", "time", "gid"))
    // sim 0's spikes (validated against raw bytes in Hdf5Spec) survive the
    // window assignment + class join intact
    val sim0 = report.filter(col("simulation_id") === 0)
      .orderBy("time").collect()
    assert(sim0.length === 10)
    assert(math.abs(sim0(0).getAs[Double]("time") - 22.3000000001) < 1e-9)
    assert(sim0(0).getAs[Long]("gid") === 300L)
    assert(report.count() === repo.simulations.count() * 10) // 10 spikes per sim
  }
}
