package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Config migration (reference: apps/migrate.py, expected shapes from
  * tests/unit/apps/test_migrate.py).
  */
class MigrateSpec extends AnyFunSuite {

  // the reference test's v1 input (test_migrate.py:17-42), as YAML
  private val v1Yaml =
    """simulation_campaign: /path/to/config.json
      |simulations_filter_in_memory: {simulation_id: 2}
      |output: output_dir
      |extraction:
      |  neuron_classes:
      |    L1_EXC: {layer: ["1"], synapse_class: [EXC]}
      |    L1_EXC_gids: {layer: ["1"], synapse_class: [EXC], gid: [1, 2]}
      |  limit: null
      |  target: null
      |  windows:
      |    w1: {bounds: [20, 90], window_type: spontaneous}
      |analysis:
      |  features:
      |    - type: multi
      |      groupby: [simulation_id, circuit_id, neuron_class, window]
      |      function: module.user.function
      |      params: {export_all_neurons: true}
      |""".stripMargin

  private def loadYamlString(txt: String): Map[String, Any] = {
    val f = Files.createTempFile("graft-migrate", ".yaml")
    Files.writeString(f, txt)
    ConfigIO.loadMap(f.toString)
  }

  test("v1 → v4 matches the reference's expected transformation") {
    val out = Migrate.migrate(loadYamlString(v1Yaml))
    assert(out("version") === 4)
    assert(out("simulation_campaign") === "/path/to/config.json")
    assert(out("simulations_filter_in_memory") === Map("simulation_id" -> 2))
    assert(out("cache") === Map("path" -> "output_dir"))
    assert(!out.contains("output") && !out.contains("extraction"))
    val spikes = out("analysis").asInstanceOf[Map[String, Any]]("spikes")
      .asInstanceOf[Map[String, Any]]
    val ex = spikes("extraction").asInstanceOf[Map[String, Any]]
    assert(ex("report") === Map("type" -> "spikes"))
    assert(ex("node_set") === null && ex("limit") === null) // target renamed
    val nc = ex("neuron_classes").asInstanceOf[Map[String, Any]]
    assert(nc("L1_EXC") ===
      Map("query" -> Map("layer" -> Seq("1"), "synapse_class" -> Seq("EXC"))))
    assert(nc("L1_EXC_gids") === Map(
      "query" -> Map("layer" -> Seq("1"), "synapse_class" -> Seq("EXC")),
      "node_id" -> Seq(1, 2))) // $gids → node_id
    val feats = spikes("features").asInstanceOf[Seq[Any]]
    assert(feats.length === 1)
    assert(feats.head.asInstanceOf[Map[String, Any]]("function") === "module.user.function")
    // migrated output passes structural validation (migrate.py:131)
    assert(Validation.validateAnalysis(Migrate.sortRootKeys(out)) === Nil)
  }

  test("v3 → v4: output/clear_cache fold into cache, collisions rejected") {
    val v3 = Map(
      "version" -> 3, "simulation_campaign" -> "c.json",
      "output" -> "outdir", "clear_cache" -> true,
      "analysis" -> Map.empty[String, Any])
    val out = Migrate.migrate(v3)
    assert(out("cache") === Map("path" -> "outdir", "clear" -> true))
    assert(!out.contains("output") && !out.contains("clear_cache"))
    // output alongside cache.path is an error (analysis_model.py:241-243)
    assertThrows[IllegalArgumentException] {
      Migrate.migrate(v3 + ("cache" -> Map("path" -> "other")))
    }
  }

  test("v3 → v4: explicit null output/clear_cache is skipped, not folded") {
    // migrate.py:89-92 pops with a None default and only sets when not None:
    // `output: null` must neither write cache.path=null nor raise a
    // collision against an existing cache.path
    val v3 = Map(
      "version" -> 3, "simulation_campaign" -> "c.json",
      "output" -> null, "clear_cache" -> null,
      "cache" -> Map("path" -> "keep"),
      "analysis" -> Map.empty[String, Any])
    val out = Migrate.migrate(v3)
    assert(out("cache") === Map("path" -> "keep"))
    assert(!out.contains("output") && !out.contains("clear_cache"))
  }

  test("current-version config passes through unchanged") {
    val v4 = Map(
      "version" -> 4, "simulation_campaign" -> "c.json",
      "cache" -> Map("path" -> "o"),
      "analysis" -> Map.empty[String, Any])
    assert(Migrate.migrate(v4) === v4)
  }

  test("unsupported versions are rejected") {
    assertThrows[IllegalArgumentException] {
      Migrate.migrate(Map("version" -> 5, "analysis" -> Map.empty[String, Any]))
    }
    assertThrows[IllegalArgumentException] {
      Migrate.migrate(Map("version" -> 0, "analysis" -> Map.empty[String, Any]))
    }
  }

  test("sortRootKeys orders the canonical keys first") {
    val m = Map("analysis" -> 1, "zz" -> 2, "version" -> 3, "cache" -> 4)
    assert(Migrate.sortRootKeys(m).keys.toSeq === Seq("version", "cache", "analysis", "zz"))
  }

  test("migrated YAML round-trips through dump + validate-config load") {
    val outFile = Files.createTempFile("graft-migrated", ".yaml").toString
    val migrated = Migrate.sortRootKeys(Migrate.migrate(loadYamlString(v1Yaml)))
    ConfigIO.dumpYaml(outFile, migrated)
    val reloaded = ConfigIO.loadMap(outFile)
    assert(Validation.validateAnalysis(reloaded) === Nil)
    assert(reloaded("version") === 4)
    assert(reloaded("cache") === Map("path" -> "output_dir"))
  }
}
