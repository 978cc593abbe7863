package graft.engine

import graft.SparkSuite
import graft.dsl._
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class NodeSetsSpec extends SparkSuite {

  import spark.implicits._

  private lazy val nodes = Seq(
    (0L, 1L, "exc"), (1L, 1L, "inh"), (2L, 2L, "exc"), (3L, 2L, "inh"), (4L, 3L, "exc")
  ).toDF("gid", "layer", "etype")

  private val ns = NodeSets(Map(
    "L1" -> Map("layer" -> Seq(1)),
    "Exc" -> Map("etype" -> "exc"),
    "Picked" -> Map("node_id" -> Seq(0, 3, 4)),
    "PickedExc" -> Map("node_id" -> Seq(0, 3, 4), "etype" -> Seq("exc")),
    "Combined" -> Seq("L1", "Picked")))

  private def gids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("gid").collect().map(_.getLong(0)).toSeq.sorted

  test("property, id, mixed, and compound selections") {
    assert(gids(ns.select("L1", nodes)) === Seq(0L, 1L))
    assert(gids(ns.select("Exc", nodes)) === Seq(0L, 2L, 4L))
    assert(gids(ns.select("Picked", nodes)) === Seq(0L, 3L, 4L))
    assert(gids(ns.select("PickedExc", nodes)) === Seq(0L, 4L))
    assert(gids(ns.select("Combined", nodes)) === Seq(0L, 1L, 3L, 4L))
  }

  test("unknown set and cycles error") {
    assertThrows[IllegalArgumentException] { ns.select("nope", nodes) }
    val cyc = NodeSets(Map("a" -> Seq("b"), "b" -> Seq("a")))
    assertThrows[IllegalArgumentException] { cyc.select("a", nodes) }
  }

  test("merge: right side wins") {
    val merged = ns ++ NodeSets(Map("L1" -> Map("layer" -> Seq(2))))
    assert(gids(merged.select("L1", nodes)) === Seq(2L, 3L))
  }

  test("class scoping by node_set + t_step subsampling through the repository") {
    val dir = Files.createTempDirectory("graft-ns").toString
    // regular 0.5-step frame grid so t_step=1.0 keeps every other sample
    val frames = (0 until 20).flatMap(i => Seq(0L, 1L, 2L).map(g =>
      (i * 0.5, g, i * 0.1)))
    frames.toDF("time", "gid", "value").write.mode("overwrite").parquet(s"$dir/sim0")
    nodes.write.mode("overwrite").parquet(s"$dir/nodes")
    Files.writeString(Paths.get(dir, "sets.json"),
      """{"L1": {"layer": [1]}}""")
    val campaign = Campaign("ns", dir, Map.empty, Seq(
      Map("simulation_path" -> "sim0", "circuit_path" -> s"$dir/nodes")))
    val cfg = SingleAnalysisConfig(
      name = "s", reportType = "soma",
      windows = Map("w" -> WindowSpec(bounds = (0.0, 100.0), tStep = 1.0)),
      neuronClasses = Map("scoped" -> NeuronClassSpec(nodeSet = Some("L1"))),
      features = Nil,
      nodeSetsFile = Some(s"$dir/sets.json"))
    val repo = new Repository(spark, campaign, cfg, new ParquetAdapter)
    // neurons limited to the L1 set
    assert(gids(repo.neurons) === Seq(0L, 1L))
    val r = repo.report
    // only whole-unit times survive the t_step grid; only L1 gids remain
    val times = r.select("time").distinct().collect().map(_.getDouble(0)).sorted
    assert(times.forall(t => t == math.floor(t)), times.mkString(","))
    assert(times.length === 10)
    assert(r.select("gid").distinct().count() === 2)
  }
}
