package graft.engine

import graft.SparkSuite
import graft.dsl._
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** C3 lifecycle: a cache built with a broad simulations filter serves a
  * narrower request by re-filtering loaded frames (no recompute), and a
  * non-narrower filter rebuilds (reference: cache.py:575-610 +
  * doc/source/usage.rst "narrower and broader filters").
  */
class CacheReuseSpec extends SparkSuite {

  private lazy val fixture: (String, Campaign, SingleAnalysisConfig) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-c3").toString
    for (i <- 0 until 3) {
      (1 to 50).map(k => (k * 10.0, (k % 4).toLong))
        .toDF("time", "gid").write.mode("overwrite").parquet(s"$dir/sim$i")
    }
    Seq(0L, 1L, 2L, 3L).toDF("gid").write.mode("overwrite").parquet(s"$dir/nodes")
    val campaign = Campaign("c3", dir, Map.empty, (0 until 3).map { i =>
      Map[String, Any](
        "simulation_path" -> s"sim$i", "circuit_path" -> s"$dir/nodes", "ca" -> (1.0 + i))
    })
    val cfg = SingleAnalysisConfig(
      name = "s", reportType = "spikes",
      windows = Map("w" -> WindowSpec(bounds = (0.0, 1000.0))),
      neuronClasses = Map("all" -> NeuronClassSpec()),
      features = Seq(FeaturesSpec(
        groupby = Seq("simulation_id", "circuit_id", "neuron_class", "window"),
        function = "mean_firing_rates")))
    (dir, campaign, cfg)
  }

  private def reportFiles(out: String): Set[String] = {
    val d = Paths.get(s"$out/repo/report.parquet")
    if (!Files.exists(d)) Set.empty
    else Files.list(d).toArray.map(_.toString).toSet
  }

  test("narrower filter reuses the cache and refilters; broader rebuilds") {
    val (dir, campaign, cfg) = fixture
    val out = s"$dir/out"

    // 1. build with the broad filter {ca isin [1.0, 2.0]}
    val broad = QAnd("ca" -> QCond(QIsIn(Seq(1.0, 2.0))))
    val a1 = new Analyzer(spark, cfg, campaign, new ParquetAdapter, broad,
      Some(new CacheManager(spark, out)))
    a1.extractRepo()
    val f1 = a1.calculateFeatures()
    assert(a1.simulations.count() === 2)
    assert(f1("by_gid").select("simulation_id").distinct().count() === 2)
    val builtFiles = reportFiles(out)
    assert(builtFiles.nonEmpty)
    a1.cache.get.close()

    // 2. narrower {ca: 1.0}: cache files untouched, outputs refiltered
    val narrow = QAnd("ca" -> QCond(QEq(1.0)))
    val a2 = new Analyzer(spark, cfg, campaign, new ParquetAdapter, narrow,
      Some(new CacheManager(spark, out)))
    assert(a2.simulations.count() === 1)
    assert(a2.report.select("simulation_id").distinct().count() === 1)
    val f2 = a2.calculateFeatures()
    assert(f2("by_gid").select("simulation_id").distinct().count() === 1)
    assert(reportFiles(out) === builtFiles, "narrow request must not rewrite the cache")
    // stored filter is still the broad one
    val stored = a2.cache.get.loadStoredFilterDict().map(Q.parse)
    assert(stored.exists(s => Q.isSubfilter(narrow, s)))
    a2.cache.get.close()

    // 3. broader {ca isin [1.0, 2.0, 3.0]}: not a subfilter → rebuild
    val broader = QAnd("ca" -> QCond(QIsIn(Seq(1.0, 2.0, 3.0))))
    val a3 = new Analyzer(spark, cfg, campaign, new ParquetAdapter, broader,
      Some(new CacheManager(spark, out)))
    assert(a3.simulations.count() === 3)
    assert(a3.report.select("simulation_id").distinct().count() === 3)
    assert(reportFiles(out) !== builtFiles, "broader request must rebuild")
    a3.cache.get.close()
  }

  test("corrupted cache file forces a rebuild (C4)") {
    val (dir, campaign, cfg) = fixture
    val out = s"$dir/out_c4"
    val a1 = new Analyzer(spark, cfg, campaign, new ParquetAdapter, QTrue,
      Some(new CacheManager(spark, out)))
    val n1 = a1.simulations.count()
    a1.cache.get.close()
    // corrupt one stored parquet part
    val part = Files.list(Paths.get(s"$out/repo/simulations.parquet")).toArray
      .map(_.toString).find(_.endsWith(".parquet")).get
    Files.writeString(Paths.get(part), "garbage")
    val a2 = new Analyzer(spark, cfg, campaign, new ParquetAdapter, QTrue,
      Some(new CacheManager(spark, out)))
    assert(a2.simulations.count() === n1) // digest mismatch → recompute, not crash
    a2.cache.get.close()
  }

  test("specDict round-trips through JSON for the supported forms") {
    val specs = Seq(
      QTrue,
      QAnd("a" -> QCond(QEq(1)), "b" -> QCond(Seq(QGe(2.5), QLt(10.0)))),
      QAnd("s" -> QCond(QIsIn(Seq("x", "y")))),
      QOr(Seq(QAnd("a" -> QCond(QEq(1))), QAnd("b" -> QCond(QRegex("^z"))))))
    for (s <- specs) {
      val dict = Describe.specDict(s)
      val json = ConfigIO.canonical(Map("filter" -> dict))
      val dir = Files.createTempDirectory("graft-rt").toString
      Files.writeString(Paths.get(dir, "filter.json"), json)
      val cm = new CacheManager(spark, dir)
      val back = cm.loadStoredFilterDict().map(Q.parse).get
      cm.close()
      // semantic equality via mutual subfilter implication
      assert(Q.isSubfilter(back, s) && Q.isSubfilter(s, back),
        s"round-trip changed semantics: $s -> $back")
    }
  }
}
