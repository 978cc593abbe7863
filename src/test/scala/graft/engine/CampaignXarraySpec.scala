package graft.engine

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The xarray-dict campaign format (reference campaign/config.py:208-267):
  * product and coupled coordinate layouts, excluded-simulation handling,
  * and end-to-end equivalence with the native row format.
  */
class CampaignXarraySpec extends SparkSuite {

  private def write(dir: String, name: String, body: String): String = {
    val p = Paths.get(dir, name)
    Files.writeString(p, body)
    p.toString
  }

  test("product layout: row-major cartesian of dim coords, empty cell kept") {
    val dir = Files.createTempDirectory("graft-xr-prod").toString
    val f = write(dir, "campaign.yaml",
      s"""name: prod-campaign
         |attrs: {path_prefix: "$dir"}
         |dims: [ca, seed]
         |coords:
         |  ca: {dims: [ca], attrs: {}, data: [1.1, 1.2]}
         |  seed: {dims: [seed], attrs: {}, data: [10, 20]}
         |data: [[uuid/0, uuid/1], ["", uuid/3]]
         |""".stripMargin)
    val c = ConfigIO.loadCampaign(f)
    assert(c.name === "prod-campaign")
    assert(c.rows.length === 4)
    // row-major: last dim (seed) varies fastest
    assert(c.rows.map(r => (r("ca"), r("seed"), r("simulation_path"))) === Seq(
      (1.1, 10, "uuid/0"), (1.1, 20, "uuid/1"),
      (1.2, 10, ""), (1.2, 20, "uuid/3")))
    // excluded sim keeps its empty path (never prefixed)
    assert(c.resolvedPaths === Seq(
      s"$dir/uuid/0", s"$dir/uuid/1", "", s"$dir/uuid/3"))
    assert(!c.attrs.contains("__coupled__"))
  }

  test("coupled layout: non-dim coords pair up row-wise") {
    val dir = Files.createTempDirectory("graft-xr-coup").toString
    val f = write(dir, "campaign.yaml",
      s"""name: coupled-campaign
         |attrs: {path_prefix: "$dir"}
         |dims: [coupled]
         |coords:
         |  ca: {dims: [coupled], attrs: {}, data: [1.1, 1.2, 1.3]}
         |  depolarization: {dims: [coupled], attrs: {}, data: [3.0, 4.0, 5.0]}
         |data: [uuid/0, uuid/1, ""]
         |""".stripMargin)
    val c = ConfigIO.loadCampaign(f)
    assert(c.rows.length === 3)
    assert(c.rows.map(r =>
      (r("ca"), r("depolarization"), r("simulation_path"))) === Seq(
      (1.1, 3.0, "uuid/0"), (1.2, 4.0, "uuid/1"), (1.3, 5.0, "")))
    assert(c.attrs("__coupled__") === "coupled")
  }

  test("product layout round-trips: load → dump → load identical") {
    val dir = Files.createTempDirectory("graft-xr-rt-prod").toString
    val f = write(dir, "campaign.yaml",
      s"""name: prod-campaign
         |attrs: {path_prefix: "$dir"}
         |dims: [ca, seed]
         |coords:
         |  ca: {dims: [ca], attrs: {}, data: [1.1, 1.2]}
         |  seed: {dims: [seed], attrs: {}, data: [10, 20]}
         |data: [[uuid/0, uuid/1], ["", uuid/3]]
         |""".stripMargin)
    val c = ConfigIO.loadCampaign(f)
    val out = s"$dir/dumped.yaml"
    ConfigIO.dumpCampaignXarray(c, out)
    val c2 = ConfigIO.loadCampaign(out)
    assert(c2.name === c.name)
    assert(c2.pathPrefix === c.pathPrefix)
    assert(c2.attrs === c.attrs)
    assert(c2.rows === c.rows)
    // and a second dump is byte-identical (stable ordering)
    val out2 = s"$dir/dumped2.yaml"
    ConfigIO.dumpCampaignXarray(c2, out2)
    assert(Files.readString(Paths.get(out2)) === Files.readString(Paths.get(out)))
  }

  test("coupled layout round-trips with __coupled__ preserved") {
    val dir = Files.createTempDirectory("graft-xr-rt-coup").toString
    val f = write(dir, "campaign.yaml",
      s"""name: coupled-campaign
         |attrs: {path_prefix: "$dir"}
         |dims: [coupled]
         |coords:
         |  ca: {dims: [coupled], attrs: {}, data: [1.1, 1.2, 1.3]}
         |  depolarization: {dims: [coupled], attrs: {}, data: [3.0, 4.0, 5.0]}
         |data: [uuid/0, uuid/1, ""]
         |""".stripMargin)
    val c = ConfigIO.loadCampaign(f)
    val out = s"$dir/dumped.yaml"
    ConfigIO.dumpCampaignXarray(c, out)
    val c2 = ConfigIO.loadCampaign(out)
    assert(c2.name === c.name)
    assert(c2.attrs === c.attrs) // includes __coupled__ -> coupled
    assert(c2.rows === c.rows)
    // the dumped attrs must NOT leak __coupled__ (it's re-derived on load,
    // reference pops it in to_xarray at campaign/config.py:247)
    val dumped = ConfigIO.loadMap(out)
    val attrs = dumped("attrs").asInstanceOf[Map[String, Any]]
    assert(!attrs.contains("__coupled__"))
    assert(dumped("dims") === Seq("coupled"))
  }

  test("product dump refuses ragged and duplicated campaigns loudly") {
    // row missing a condition: would silently vanish from the nested data
    val ragged = Campaign(name = "r", pathPrefix = "", attrs = Map.empty,
      rows = Seq(
        Map("simulation_path" -> "a", "ca" -> 1.1),
        Map("simulation_path" -> "b")))
    val e1 = intercept[IllegalArgumentException] {
      ConfigIO.campaignToXarrayDict(ragged)
    }
    assert(e1.getMessage.contains("lacks condition"))
    // duplicate combo: last-writer-wins would drop a simulation
    val dup = Campaign(name = "d", pathPrefix = "", attrs = Map.empty,
      rows = Seq(
        Map("simulation_path" -> "a", "ca" -> 1.1),
        Map("simulation_path" -> "b", "ca" -> 1.1)))
    val e2 = intercept[IllegalArgumentException] {
      ConfigIO.campaignToXarrayDict(dup)
    }
    assert(e2.getMessage.contains("duplicate"))
  }

  test("xarray and native formats produce the same engine output") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-xr-e2e").toString
    for (p <- 0 to 1)
      (0 until 60).map(i => (i * 10.0 + p, (i % 4).toLong))
        .toDF("time", "gid").write.mode("overwrite").parquet(s"$dir/sim$p")
    Seq(0L, 1L, 2L, 3L).toDF("gid")
      .write.mode("overwrite").parquet(s"$dir/nodes")
    val native = write(dir, "native.yaml",
      s"""name: c
         |attrs: {path_prefix: "$dir"}
         |data:
         |  - {simulation_path: sim0, circuit_path: "$dir/nodes", ca: 1.1}
         |  - {simulation_path: sim1, circuit_path: "$dir/nodes", ca: 1.2}
         |""".stripMargin)
    val xarray = write(dir, "xarray.yaml",
      s"""name: c
         |attrs: {path_prefix: "$dir"}
         |dims: [ca]
         |coords:
         |  ca: {dims: [ca], attrs: {}, data: [1.1, 1.2]}
         |data: [sim0, sim1]
         |""".stripMargin)
    val cfg = SingleAnalysisConfig(
      name = "x", reportType = "spikes",
      windows = Map("w" -> WindowSpec(bounds = (0.0, 600.0))),
      neuronClasses = Map("all" -> NeuronClassSpec()),
      features = Nil)
    def run(campaignFile: String): Seq[(Int, String, Long)] = {
      // the xarray format has no per-row circuit_path — circuits default to
      // the simulation path root; inject the shared circuit for the test
      val c0 = ConfigIO.loadCampaign(campaignFile)
      val c = c0.copy(rows = c0.rows.map(_ + ("circuit_path" -> s"$dir/nodes")))
      new Repository(spark, c, cfg, new ParquetAdapter)
        .report.groupBy("simulation_id", "window")
        .agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq.sorted
    }
    val a = run(native)
    val b = run(xarray)
    assert(a === b && a.nonEmpty)
    // condition columns agree too
    val ca1 = ConfigIO.loadCampaign(native).rows.map(_("ca"))
    val ca2 = ConfigIO.loadCampaign(xarray).rows.map(_("ca"))
    assert(ca1 === ca2)
  }
}
