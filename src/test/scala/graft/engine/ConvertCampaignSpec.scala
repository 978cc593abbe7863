package graft.engine

import graft.SparkSuite
import java.nio.file.{Files, Paths}

/** Round-trip test of the SONATA conversion contract (reference:
  * convert_spikes.py:232-320 `main` writes the whole scaffold; :94-145 pin
  * the column/sort rules). CSV in → campaign scaffold out → the engine's
  * own Repository/Analyzer reads it back — every guarantee the contract
  * documents (README.md, "SONATA interop") is asserted here.
  */
class ConvertCampaignSpec extends SparkSuite {

  private def writeCsv(dir: String): String = {
    // deliberately unsorted, with the reference's canonical column names
    val p = Paths.get(dir, "spikes.csv")
    Files.writeString(p,
      """timestamps node_ids
        |1500.0 2
        |10.0 3
        |10.0 1
        |999.5 3
        |1999.0 0
        |250.25 1
        |""".stripMargin)
    p.toString
  }

  test("oversize campaign skips the driver-collected .h5 write, parquet stays complete") {
    val dir = Files.createTempDirectory("graft-campaign-big").toString
    // maxH5Rows below the row count → the interop .h5 must be refused...
    val stats = Convert.convertCampaign(
      spark, writeCsv(dir), s"$dir/out", maxH5Rows = 5L).collect()(0)
    assert(stats.getLong(0) === 6)
    assert(!Files.exists(Paths.get(s"$dir/out/simulation/synthetic_spikes.h5")))
    // ...while the parquet campaign scaffold is complete and loadable
    for (f <- Seq(
        "simulation/synthetic_spikes.parquet", "circuit/synthetic_nodes.parquet",
        "circuit/circuit_config.json", "simulation/simulation_config.json"))
      assert(Files.exists(Paths.get(s"$dir/out/$f")), f)
    assert(spark.read.parquet(s"$dir/out/simulation/synthetic_spikes.parquet").count() === 6)
  }

  test("convert-spikes scaffold: layout, column/sort contract, stats") {
    val dir = Files.createTempDirectory("graft-campaign").toString
    val stats = Convert.convertCampaign(spark, writeCsv(dir), s"$dir/out").collect()(0)

    // import statistics match the reference's DataStats (convert_spikes.py:109-130)
    assert(stats.getLong(0) === 6)                      // rows
    assert(stats.getLong(1) === 4)                      // unique ids
    assert(stats.getLong(2) === 0 && stats.getLong(3) === 3)
    assert(stats.getDouble(4) === 10.0 && stats.getDouble(5) === 1999.0)

    // layout (reference convert_spikes.py:288-301)
    for (f <- Seq(
        "analysis_config.yaml", "simulation_campaign_config.json",
        "circuit/circuit_config.json", "circuit/node_sets.json",
        "circuit/synthetic_nodes.parquet",
        "simulation/simulation_config.json",
        "simulation/synthetic_spikes.parquet"))
      assert(Files.exists(Paths.get(s"$dir/out", f)), s"missing $f")

    // spikes: (time DOUBLE ms, gid BIGINT) sorted by (time, gid) —
    // reference sort_values([timestamps, node_ids]) + DTYPES
    val sp = spark.read.parquet(s"$dir/out/simulation/synthetic_spikes.parquet")
    assert(sp.schema.map(f => (f.name, f.dataType.simpleString)) ===
      Seq(("time", "double"), ("gid", "bigint")))
    val rows = sp.collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(rows === rows.sorted)
    assert(rows === Seq((10.0, 1L), (10.0, 3L), (250.25, 1L), (999.5, 3L),
      (1500.0, 2L), (1999.0, 0L)))

    // node table: size = max_id + 1 (convert_spikes.py:265)
    val nodes = spark.read.parquet(s"$dir/out/circuit/synthetic_nodes.parquet")
    assert(nodes.count() === 4)
    assert(nodes.columns.contains("gid"))
  }

  test("scaffold is runnable: campaign + analysis configs load and extract") {
    val dir = Files.createTempDirectory("graft-campaign2").toString
    Convert.convertCampaign(spark, writeCsv(dir), s"$dir/out").collect()

    val campaign = ConfigIO.loadCampaign(s"$dir/out/simulation_campaign_config.json")
    assert(campaign.name === "synthetic")
    assert(campaign.rows.size === 1)
    assert(campaign.resolvedPaths.head.endsWith("simulation/synthetic_spikes.parquet"))

    // the generated analysis config passes structural validation and runs
    // end-to-end through the engine's own extraction
    val ma = MultiAnalyzer.fromFile(spark, s"$dir/out/analysis_config.yaml")
    try {
      val an = ma.analyzers("spikes")
      an.repo.validateWindows()
      assert(an.df("simulations").count() === 1)
      assert(an.df("neurons").count() === 4)           // all 0..max_id nodes
      // w1 [0,1000): 4 spikes; w2 [1000,2000): 2 — every CSV row lands in
      // exactly one window, none dropped
      val rep = an.df("report")
        .groupBy("window").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rep === Map("w1" -> 4L, "w2" -> 2L))
      // feature scaffold computes over the extracted frame
      val feats = an.calculateFeatures()
      assert(feats.nonEmpty && feats.values.forall(_.count() > 0))
    } finally ma.close()
  }
}
