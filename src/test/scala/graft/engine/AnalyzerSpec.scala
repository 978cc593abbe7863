package graft.engine

import graft.SparkSuite
import graft.dsl._
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** End-to-end engine test: a 2-simulation campaign carved out of the
  * sf0.001 events table (user_id parity = "simulation"), nodes derived
  * from distinct gids, full extraction + features + cache + applyFilter.
  */
class AnalyzerSpec extends SparkSuite {

  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("graft-engine-fix").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf0001/events.parquet")
    val spikes = raw
      .withColumn("time",
        (graft.Tables.tsMicros(raw) - lit(graft.Tables.EventsEpochMicros)).cast("double") / 1000.0)
      .withColumnRenamed("user_id", "gid")
      .select("time", "gid")
    for (p <- 0 to 1)
      spikes.filter(col("gid") % 2 === p)
        .write.mode("overwrite").parquet(s"$dir/sim$p/spikes.parquet")
    val nodes = spikes.select("gid").distinct()
      .withColumn("parity", (col("gid") % 2).cast("long"))
      .withColumn("cohort", (col("gid") % 5).cast("long"))
    nodes.write.mode("overwrite").parquet(s"$dir/circuit/nodes.parquet")
    Files.writeString(Paths.get(dir, "campaign.yaml"),
      s"""name: test-campaign
         |attrs:
         |  path_prefix: "$dir"
         |data:
         |  - {simulation_path: sim0/spikes.parquet, circuit_path: "$dir/circuit/nodes.parquet", ca: 1.1, seed: 1}
         |  - {simulation_path: sim1/spikes.parquet, circuit_path: "$dir/circuit/nodes.parquet", ca: 1.2, seed: 1}
         |  - {simulation_path: missing/spikes.parquet, circuit_path: "$dir/circuit/nodes.parquet", ca: 1.3, seed: 1}
         |""".stripMargin)
    Files.writeString(Paths.get(dir, "analysis.yaml"),
      s"""simulation_campaign: $dir/campaign.yaml
         |output: $dir/out
         |seed: 0
         |simulations_filter_in_memory: {ca: 1.1}
         |analysis:
         |  spikes:
         |    extraction:
         |      report: {type: spikes}
         |      neuron_classes:
         |        even: {query: {parity: 0}}
         |        c0:   {query: {cohort: 0}, limit: 10}
         |        all:  {}
         |      windows:
         |        w1: {bounds: [0, 500000], n_trials: 2, trial_steps_value: 1000000}
         |        w2: {bounds: [0, 2000000]}
         |    features:
         |      - groupby: [simulation_id, circuit_id, neuron_class, window]
         |        function: mean_firing_rates
         |        params: {hist_bin_size: 100000.0}
         |      - groupby: [simulation_id, circuit_id, neuron_class, window]
         |        function: smoothed_histograms
         |        params: {bin_size: 100000.0}
         |        windows: [w2]
         |""".stripMargin)
    dir
  }

  private lazy val ma = MultiAnalyzer.fromFile(spark, s"$fixtureDir/analysis.yaml")
  private lazy val an = ma("spikes")

  test("simulations_filter_in_memory: MultiAnalyzer.applyFilter() narrows by config") {
    val filtered = ma.applyFilter()("spikes")
    val sims = filtered.simulations.select("ca").collect().map(_.getDouble(0))
    assert(sims.toSeq === Seq(1.1))
    // explicit filter overrides the config key
    val all = ma.applyFilter(graft.dsl.QTrue)("spikes")
    assert(all.simulations.count() === 2)
  }

  test("simulations: status filter drops the missing sim, conditions survive") {
    val sims = an.simulations.collect()
    assert(sims.length === 2)
    assert(an.simulations.columns.contains("ca"))
    val cas = an.simulations.select("ca").collect().map(_.getDouble(0)).sorted
    assert(cas.toSeq === Seq(1.1, 1.2))
  }

  test("neurons: class queries + limit + per-class index") {
    val n = an.neurons
    val byClass = n.groupBy("neuron_class").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cohort0 = spark.read.parquet(s"$fixtureDir/circuit/nodes.parquet")
      .filter(col("cohort") === 0).count()
    assert(byClass("c0") === math.min(10L, cohort0)) // limit applied
    assert(byClass.contains("even") && byClass.contains("all"))
    // parity query actually filtered
    val evenGids = n.filter(col("neuron_class") === "even").select("gid")
      .collect().map(_.getLong(0))
    assert(evenGids.forall(_ % 2 == 0))
    // index is 0..count-1 per class
    val idx = n.filter(col("neuron_class") === "c0")
      .select("neuron_class_index").collect().map(_.getLong(0)).sorted
    assert(idx.toSeq === (0L until byClass("c0")))
  }

  test("neuron_classes: counts match neurons") {
    val counts = an.neuronClasses.select("neuron_class", "count").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fromNeurons = an.neurons.groupBy("neuron_class").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === fromNeurons)
  }

  test("windows: trials shift by trial_steps_value") {
    val w = an.windows.filter(col("window") === "w1" && col("simulation_id") === 0)
      .select("trial", "offset").collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    assert(w === Map(0 -> 0.0, 1 -> 1000000.0))
    assert(an.windows.count() === 2 * 3) // 2 sims × (2 trials + 1 window)
  }

  test("report: window containment, rebase, and class tagging hold") {
    val r = an.report
    assert(r.filter(col("time") < 0).count() === 0)
    val w2max = r.filter(col("window") === "w2").agg(max("time")).collect()(0).getDouble(0)
    assert(w2max < 2000000.0)
    // every (sim, gid) pair respects the parity split of the fixture
    val bad = r.filter(col("neuron_class") === "even" && col("gid") % 2 =!= 0).count()
    assert(bad === 0)
    // spikes from sim0 carry simulation_id 0
    val simGidParity = r.select("simulation_id", "gid").distinct()
      .filter((col("gid") % 2) =!= col("simulation_id")).count()
    assert(simGidParity === 0)
  }

  test("features: firing rates match a direct computation") {
    val feats = an.calculateFeatures()
    // mean_firing_rates emits all five bnac frames
    // (reference: bnac/calculate_features.py:173-179)
    for (n <- Seq("by_gid", "by_gid_and_trial", "by_neuron_class",
        "by_neuron_class_and_trial", "histograms"))
      assert(feats.contains(n), s"missing feature frame '$n'")
    val byGid = feats("by_gid")
    // direct check for one cell: class 'all', window 'w2' (1 trial) —
    // mean_count == raw spike count in that window, rate = cnt*1000/duration
    val cell = byGid.filter(
      col("neuron_class") === "all" && col("window") === "w2" && col("simulation_id") === 0)
    val direct = an.report.filter(
        col("neuron_class") === "all" && col("window") === "w2" && col("simulation_id") === 0)
      .groupBy("gid").agg(count(lit(1)).as("cnt"))
    val joined = cell.join(direct, Seq("gid"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    assert(joined.filter(abs(col("mean_count") - col("cnt")) > 1e-9).count() === 0)
    assert(joined.filter(
      abs(col("mean_firing_rate") - col("cnt") * 1000.0 / 2000000.0) > 1e-9).count() === 0)
    // the second spec's frame is scoped to w2 only (P6)
    assert(feats("smoothed_histograms").select("window").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("w2"))
    // by_gid_and_trial: per-trial counts match the report directly; only
    // spiking rows are kept (reference dropna, export_all_neurons=False)
    val bgt = feats("by_gid_and_trial").filter(
      col("neuron_class") === "all" && col("window") === "w2" && col("simulation_id") === 0)
    val directTrial = an.report.filter(
        col("neuron_class") === "all" && col("window") === "w2" && col("simulation_id") === 0)
      .groupBy("trial", "gid").agg(count(lit(1)).as("cnt"), min("time").as("mt"))
    val jt = bgt.join(directTrial, Seq("trial", "gid"), "full")
    assert(jt.filter(col("count").isNull || col("cnt").isNull ||
      col("count") =!= col("cnt") || col("first_spike") =!= col("mt")).count() === 0)
    assert(bgt.filter(size(col("times")) =!= col("count")).count() === 0)
    // by_neuron_class_and_trial equals the universe-filled per-trial mean
    val universeN = an.neurons.filter(col("neuron_class") === "all").count()
    val bct = feats("by_neuron_class_and_trial").filter(
      col("neuron_class") === "all" && col("window") === "w2" && col("simulation_id") === 0)
    val spikesW2 = an.report.filter(
      col("neuron_class") === "all" && col("window") === "w2" &&
        col("simulation_id") === 0).count()
    val got = bct.select("mean_of_spike_counts").collect().map(_.getDouble(0)).toSeq
    assert(got.size === 1)
    assert(math.abs(got.head - spikesW2.toDouble / universeN) < 1e-6)
  }

  test("duplicate feature output names are rejected") {
    val bad = an.cfg.copy(features = an.cfg.features.take(1) ++ an.cfg.features.take(1))
    val an2 = new Analyzer(spark, bad, an.campaign, an.adapter)
    val ex = intercept[IllegalArgumentException](an2.calculateFeatures())
    assert(ex.getMessage.contains("duplicate feature output name"))
  }

  test("cache: second analyzer loads from parquet and matches") {
    an.extractRepo()
    val n1 = an.report.count()
    ma.close()
    val ma2 = MultiAnalyzer.fromFile(spark, s"$fixtureDir/analysis.yaml")
    val an2 = ma2("spikes")
    assert(Files.exists(Paths.get(s"$fixtureDir/out/spikes/repo/report.parquet")))
    assert(an2.report.count() === n1)
    // loaded-from-cache plan is a bare parquet scan (no join in the plan)
    val plan = an2.report.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"expected cache scan, got:\n$plan")
    ma2.close()
  }

  test("applyFilter: in-memory rescope by condition column") {
    val filtered = an.applyFilter(QAnd("ca" -> QCond(QEq(1.1))))
    assert(filtered.simulations.count() === 1)
    assert(filtered.report.select("simulation_id").distinct().count() === 1)
    // features rescope too
    val f = filtered.calculateFeatures()
    assert(f("by_gid").select("simulation_id").distinct().count() === 1)
  }

  test("smoothed_histograms feature: mass preserved, deterministic") {
    val ctx = FeatureCtx(
      spark, Seq("simulation_id", "circuit_id", "neuron_class", "window"),
      Map("bin_size" -> 100000.0, "sigma" -> 2.0),
      an.report.filter(col("window") === "w2"),
      an.windows, an.neurons, an.neuronClasses)
    val sm = SmoothedHistograms.compute(ctx)("smoothed_histograms")
    val raw = Histograms.compute(ctx)("histograms")
    // gaussian kernel with reflect boundary preserves total mass per group
    val a = sm.groupBy("neuron_class").agg(sum("smoothed").as("m"))
    val b = raw.groupBy("neuron_class").agg(sum("cnt").as("m2"))
    val joined = a.join(b, "neuron_class")
      .filter(abs(col("m") - col("m2")) > 1e-6)
    assert(joined.count() === 0)
  }

  test("subfilter algebra gates cache filter reuse") {
    val cm = an.cache
    val narrow = QAnd("ca" -> QCond(QEq(1.1)))
    val broad = QAnd("ca" -> QCond(QIsIn(Seq(1.1, 1.2))))
    assert(Q.isSubfilter(narrow, broad))
    assert(!Q.isSubfilter(broad, narrow))
  }

  test("windows invariants validate (A9)") {
    an.repo.validateWindows()
  }

  test("cross-analysis window references resolve (C7)") {
    val a1 = SingleAnalysisConfig(
      name = "a1", reportType = "spikes",
      windows = Map("w1" -> WindowSpec(bounds = (0.0, 10.0))),
      neuronClasses = Map.empty, features = Nil)
    val a2 = SingleAnalysisConfig(
      name = "a2", reportType = "spikes",
      windows = Map("own" -> WindowSpec(bounds = (5.0, 6.0))),
      neuronClasses = Map.empty, features = Nil,
      windowRefs = Map("borrowed" -> "a1.extraction.windows.w1"))
    val resolved = MultiAnalyzer.resolveWindowRefs(Seq(a1, a2))
    val r2 = resolved.find(_.name == "a2").get
    assert(r2.windows("borrowed") === a1.windows("w1"))
    assert(r2.windows.keySet === Set("own", "borrowed"))
    // cycle detection
    val c1 = a1.copy(windowRefs = Map("x" -> "a2.extraction.windows.own"))
    assertThrows[IllegalArgumentException] {
      MultiAnalyzer.resolveWindowRefs(Seq(c1, a2))
    }
  }

  test("dynamic-onset windows: per-simulation offset detected from spikes") {
    // synthetic: quiet baseline then a burst at t=5000 for sim0, t=7000 for sim1
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-onset").toString
    def sim(burstAt: Double): Seq[(Double, Long)] =
      (0 until 25).map(i => (i * 100.0 + 1.0, (i % 3).toLong)) ++ // 1 spike / 100-unit bin
        (0 until 200).map(i => (burstAt + i * 0.4, (i % 3).toLong))
    sim(5000.0).toDF("time", "gid").write.mode("overwrite").parquet(s"$dir/sim0")
    sim(7000.0).toDF("time", "gid").write.mode("overwrite").parquet(s"$dir/sim1")
    Seq(0L, 1L, 2L).toDF("gid").write.mode("overwrite").parquet(s"$dir/nodes")
    val campaign = Campaign("onset", dir, Map.empty, Seq(
      Map("simulation_path" -> "sim0", "circuit_path" -> s"$dir/nodes"),
      Map("simulation_path" -> "sim1", "circuit_path" -> s"$dir/nodes")))
    val cfg = SingleAnalysisConfig(
      name = "s", reportType = "spikes",
      windows = Map("w" -> WindowSpec(
        bounds = (0.0, 10000.0), windowType = "dynamic_onset")),
      neuronClasses = Map("all" -> NeuronClassSpec()),
      features = Nil)
    val repo = new Repository(spark, campaign, cfg, new ParquetAdapter)
    val offs = repo.windows.select("simulation_id", "offset").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // bin width = 10000/100 = 100; baseline bins 0..24 have ~1 spike;
    // burst bins exceed mean+2σ → onset = first burst bin * 100
    assert(offs(0) === 5000.0)
    assert(offs(1) === 7000.0)
  }

  test("three-valued simulation status: COMPLETE / INCOMPLETE / MISSING (P3)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-status").toString
    Seq((10.0, 0L), (20.0, 1L)).toDF("time", "gid")
      .write.mode("overwrite").parquet(s"$dir/sim_ok")
    // present but empty: a sim still being written (or crashed mid-write)
    Files.createDirectories(Paths.get(s"$dir/sim_partial"))
    Seq(0L, 1L).toDF("gid").write.mode("overwrite").parquet(s"$dir/nodes")
    val campaign = Campaign("status", dir, Map.empty, Seq(
      Map("simulation_path" -> "sim_ok", "circuit_path" -> s"$dir/nodes", "ca" -> 1.1),
      Map("simulation_path" -> "sim_partial", "circuit_path" -> s"$dir/nodes", "ca" -> 1.2),
      Map("simulation_path" -> "sim_gone", "circuit_path" -> s"$dir/nodes", "ca" -> 1.3)))
    val cfg = SingleAnalysisConfig(
      name = "s", reportType = "spikes",
      windows = Map("w" -> WindowSpec(bounds = (0.0, 100.0))),
      neuronClasses = Map("all" -> NeuronClassSpec()),
      features = Nil)
    val repo = new Repository(spark, campaign, cfg, new ParquetAdapter)
    val statuses = repo.simulationsWithStatus.select("ca", "_status").collect()
      .map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(statuses === Map(1.1 -> "COMPLETE", 1.2 -> "INCOMPLETE", 1.3 -> "MISSING"))
    // fresh extraction keeps only COMPLETE (simulations.py:115-166, cached=False)
    assert(repo.simulations.select("ca").collect().map(_.getDouble(0)).toSeq === Seq(1.1))
    // the status view is a LIVE probe on the SAME repository: a sim that
    // completes after the first call is visible on the next (was a lazy val
    // returning the stale first observation)
    Seq((10.0, 0L)).toDF("time", "gid")
      .write.mode("overwrite").parquet(s"$dir/sim_partial")
    val after = repo.simulationsWithStatus.select("ca", "_status").collect()
      .map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(after(1.2) === "COMPLETE")
  }

  test("cached load keeps sims that degraded on disk (simulations.py:115-166)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-status-cache").toString
    Seq((10.0, 0L), (20.0, 1L)).toDF("time", "gid")
      .write.mode("overwrite").parquet(s"$dir/sim0")
    Seq(0L, 1L).toDF("gid").write.mode("overwrite").parquet(s"$dir/nodes")
    val campaign = Campaign("degrade", dir, Map.empty, Seq(
      Map("simulation_path" -> "sim0", "circuit_path" -> s"$dir/nodes")))
    val cfg = SingleAnalysisConfig(
      name = "s", reportType = "spikes",
      windows = Map("w" -> WindowSpec(bounds = (0.0, 100.0))),
      neuronClasses = Map("all" -> NeuronClassSpec()),
      features = Nil)
    val cm1 = new CacheManager(spark, s"$dir/out")
    val a1 = new Analyzer(spark, cfg, campaign, new ParquetAdapter, QTrue, Some(cm1))
    assert(a1.simulations.count() === 1) // writes through to the cache
    cm1.close() // release the cache dir lock (C5) before reopening
    // the sim's data vanishes from disk after caching
    val simDir = new java.io.File(s"$dir/sim0")
    simDir.listFiles().foreach(_.delete())
    val a2 = new Analyzer(spark, cfg, campaign, new ParquetAdapter, QTrue,
      Some(new CacheManager(spark, s"$dir/out")))
    // cached load does NOT re-drop: the row survives (reference cached=True)
    assert(a2.simulations.count() === 1)
    // while the LIVE status probe reports the degradation
    val live = a2.simulationsWithStatus.select("_status").head.getString(0)
    assert(live === "INCOMPLETE")
  }

  test("compartment report: section column survives extraction") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-comp").toString
    Seq((10.0, 0L, 0.5, 1L), (20.0, 1L, 0.7, 2L), (30.0, 0L, 0.9, 1L))
      .toDF("time", "gid", "value", "section")
      .write.mode("overwrite").parquet(s"$dir/sim0")
    Seq(0L, 1L).toDF("gid").write.mode("overwrite").parquet(s"$dir/nodes")
    val campaign = Campaign("comp", dir, Map.empty, Seq(
      Map("simulation_path" -> "sim0", "circuit_path" -> s"$dir/nodes")))
    val cfg = SingleAnalysisConfig(
      name = "c", reportType = "compartment",
      windows = Map("w" -> WindowSpec(bounds = (0.0, 100.0))),
      neuronClasses = Map("all" -> NeuronClassSpec()),
      features = Nil)
    val repo = new Repository(spark, campaign, cfg, new ParquetAdapter)
    val r = repo.report
    assert(r.columns.contains("section") && r.columns.contains("value"))
    assert(r.count() === 3)
    assert(r.filter(col("gid") === 0 && col("section") =!= 1).count() === 0)
  }

  test("udtf escape hatch: flatMapGroups per-group spike count") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("neuron_class", StringType), StructField("window", StringType),
      StructField("n", LongType)))
    val fn = FeatureFns.rowUdtf(
      Seq("neuron_class", "window"), schema,
      (k, it) => Iterator(org.apache.spark.sql.Row(
        k.getString(0), k.getString(1), it.size.toLong)))
    val ctx = FeatureCtx(
      spark, Seq("neuron_class", "window"), Map.empty, an.report,
      an.windows, an.neurons, an.neuronClasses)
    val out = fn.compute(ctx)("udtf")
    val viaSql = an.report.groupBy("neuron_class", "window").count()
    val diff = out.join(viaSql, Seq("neuron_class", "window"))
      .filter(col("n") =!= col("count")).count()
    assert(diff === 0)
  }
}
