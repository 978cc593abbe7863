package graft.engine

import graft.SparkSuite
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Numerical parity against the reference's OWN committed functional
  * goldens: `tests/functional/data/sonata/expected/analysis_01` stores the
  * extracted repository (report/neurons/windows) AND all five bnac feature
  * frames produced by `calculate_features_multi` with
  * `export_all_neurons: true` (config: analysis_config_01.yaml). Feeding
  * the golden repo frames into [[MeanFiringRates]] must reproduce every
  * golden feature value — the strongest cross-engine evidence available
  * without the GPFS-only raw simulation data.
  */
class GoldenBnacSpec extends SparkSuite {

  private val base =
    "/root/reference/tests/functional/data/sonata/expected/analysis_01/spikes"
  private val keys = Seq("simulation_id", "circuit_id", "neuron_class", "window")

  /** ours ≈ golden: null matches the golden NaN/null, else |a-b| ≤ tol. */
  private def ok(ours: Column, golden: Column, tol: Double): Column =
    (ours.isNull && (golden.isNull || isnan(golden))) ||
      (ours.isNotNull && golden.isNotNull && !isnan(golden) &&
        abs(ours - golden) <= tol)

  private def assertMatch(
      joined: DataFrame, checks: Seq[(String, String, Double)]): Unit =
    checks.foreach { case (oursCol, goldenCol, tol) =>
      val bad = joined.filter(!ok(col(oursCol), col(goldenCol), tol))
      val n = bad.count()
      assert(n === 0,
        s"$oursCol vs $goldenCol: $n mismatches, e.g.\n" +
          bad.limit(3).collect().mkString("\n"))
    }

  test("five frames reproduce the reference's committed analysis_01 goldens") {
    assume(new java.io.File(base).isDirectory, s"goldens not present at $base")
    def g(p: String): DataFrame = spark.read.parquet(s"$base/$p.parquet")

    val ctx = FeatureCtx(
      spark,
      groupby = keys,
      params = Map(
        "export_all_neurons" -> true, "hist_bin_size" -> 1.0, "sigma" -> 4.0),
      report = g("repo/report"),
      windows = g("repo/windows"),
      neurons = g("repo/neurons"),
      neuronClasses = spark.emptyDataFrame)
    val out = MeanFiringRates.compute(ctx)

    // ---- by_gid (9368 rows: 2342 members × 2 windows × 2 sims) ----
    val byGid = out("by_gid")
    val gByGid = g("features/by_gid")
    assert(byGid.count() === gByGid.count())
    assertMatch(
      byGid.join(gByGid, keys :+ "gid"),
      Seq(
        ("mean_count", "mean_spike_counts", 1e-9),
        ("mean_first_spike", "first_spike_time_means_cort_zeroed", 1e-9),
        ("mean_firing_rate", "mean_firing_rates_per_second", 1e-9)))

    // ---- by_gid_and_trial (universe rows under export_all_neurons) ----
    val bgt = out("by_gid_and_trial")
    val gBgt = g("features/by_gid_and_trial")
    assert(bgt.count() === gBgt.count())
    val bgtJ = bgt.join(gBgt.withColumnRenamed("count", "g_count"),
      (keys :+ "trial") :+ "gid")
    assertMatch(bgtJ, Seq(
      ("count", "g_count", 0.0),
      ("first_spike", "first", 1e-9)))
    // spike lists: exact equality after sorting the golden (the reference
    // preserves frame row order; ours is sorted)
    val timesBad = bgt.select((keys :+ "trial").map(col) :+ col("gid") :+
        col("times").as("ours"): _*)
      .join(gBgt.select((keys :+ "trial").map(col) :+ col("gid") :+
        sort_array(col("times")).as("golden"): _*), (keys :+ "trial") :+ "gid")
      // null-safe: a null golden cell vs our empty array must FAIL, not
      // vanish into SQL three-valued logic
      .filter(!(col("ours") <=> col("golden")))
    assert(timesBad.count() === 0, timesBad.limit(3).collect().mkString("\n"))

    // ---- by_neuron_class (davg routes through decimal(20,6): each value
    // rounds at 1e-6 before the mean, so class means carry ≤ ~1e-6 noise;
    // the E[x²] route widens std to ~1e-4) ----
    val gByClass = g("features/by_neuron_class")
      .withColumnRenamed("mean_of_mean_spike_counts", "g_mean_of_mean_spike_counts")
    assertMatch(
      out("by_neuron_class").join(gByClass, keys),
      Seq(
        ("mean_of_mean_spike_counts", "g_mean_of_mean_spike_counts", 2e-6),
        ("mean_of_mean_firing_rates", "mean_of_mean_firing_rates_per_second", 2e-6),
        ("std_of_mean_firing_rates", "std_of_mean_firing_rates_per_second", 1e-4),
        ("mean_of_hist", "mean_of_spike_times_normalised_hist_1ms_bin", 2e-6),
        ("min_of_hist", "min_of_spike_times_normalised_hist_1ms_bin", 1e-9),
        ("max_of_hist", "max_of_spike_times_normalised_hist_1ms_bin", 1e-9),
        ("argmax_bin", "argmax_spike_times_hist_1ms_bin", 0.0)))

    // ---- by_neuron_class_and_trial ----
    val bct = out("by_neuron_class_and_trial")
    val gBct = g("features/by_neuron_class_and_trial")
    assert(bct.count() === gBct.count())
    assertMatch(
      bct.join(gBct, keys :+ "trial"),
      Seq(("mean_of_spike_counts", "mean_of_spike_counts_for_each_trial", 1e-9)))

    // ---- histograms (smoothing: scipy float64 vs our decimal-routed
    // kernel sum agree to ~1e-9; max-normalisation divides two such) ----
    val hist = out("histograms")
    val gHist = g("features/histograms")
    assert(hist.count() === gHist.count())
    assertMatch(
      hist.join(gHist, keys :+ "bin"),
      Seq(
        ("hist", "spike_times_normalised_hist_1ms_bin", 1e-9),
        ("max_normalised_hist", "spike_times_max_normalised_hist_1ms_bin", 1e-9),
        ("smoothed_max_normalised_hist",
          "smoothed_3ms_spike_times_max_normalised_hist_1ms_bin", 1e-6)))
  }

  test("complexity PDF (a14 semantics) reproduces the analysis_07 CPDF goldens") {
    // reference: external/bluecv/neuron_class.py get_CPDF — elephant
    // Complexity at 1 ms bins = per-bin count of synchronously active
    // gids (trials concatenated), pdf over all duration bins incl. empty
    val cpdfBase =
      "/root/reference/tests/functional/data/sonata/expected/analysis_07/spikes"
    assume(new java.io.File(cpdfBase).isDirectory, "goldens not present")
    val report = spark.read.parquet(s"$cpdfBase/repo/report.parquet")
    val windows = spark.read.parquet(s"$cpdfBase/repo/windows.parquet")
      .select(col("simulation_id"), col("circuit_id"), col("window"),
        col("t_start"), col("duration")).distinct()
    val cx = report.join(broadcast(windows),
        Seq("simulation_id", "circuit_id", "window"))
      .withColumn("bin", floor(col("time") - col("t_start")).cast("long"))
      .groupBy((keys :+ "bin").map(col): _*)
      .agg(countDistinct("gid").as("c"))
    val dense = report.select(keys.map(col): _*).distinct()
      .join(broadcast(windows), Seq("simulation_id", "circuit_id", "window"))
      .withColumn("bin", explode(sequence(lit(0L), col("duration").cast("long") - 1)))
      .join(cx, keys :+ "bin", "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val pdf = dense.groupBy((keys :+ "c").map(col): _*)
      .agg(count(lit(1)).as("nb"))
      .join(broadcast(windows), Seq("simulation_id", "circuit_id", "window"))
      .withColumn("p", col("nb") / col("duration"))
      .select((keys :+ "c" :+ "p").map(col): _*)
    val golden = spark.read.parquet(s"$cpdfBase/features/by_neuron_class.parquet")
      .select(keys.map(col) :+ posexplode(col("CPDF")).as(Seq("c", "g_p")): _*)
    // every golden (complexity, p) entry must match ours; zero-p golden
    // entries have no row on our side
    val j = golden.join(pdf, keys :+ "c", "left")
      .withColumn("ours", coalesce(col("p"), lit(0.0)))
    val bad = j.filter(abs(col("ours") - col("g_p")) > 1e-9)
    assert(bad.count() === 0, bad.limit(3).collect().mkString("\n"))
    // and we produce nothing beyond the golden's support
    assert(pdf.join(golden, keys :+ "c", "left_anti").count() === 0)
  }

  test("params_product/zip suffixes match the analysis_09 golden file names") {
    // config: 3-value × 2-value params_product + 2-row params_zip
    // (analysis_config_09.yaml) → 12 combos; the reference caches each
    // frame as by_gid<suffix>.parquet with suffix _i_j__k
    val dir = new java.io.File(
      "/root/reference/tests/functional/data/sonata/expected/analysis_09/spikes/features")
    assume(dir.isDirectory, "goldens not present")
    val goldenSuffixes = dir.listFiles().map(_.getName)
      .filter(n => n.startsWith("by_gid_") && !n.startsWith("by_gid_and"))
      .map(_.stripPrefix("by_gid").stripSuffix(".parquet")).toSet
    val base = FeaturesSpec(
      groupby = Seq("simulation_id", "circuit_id", "neuron_class", "window"),
      function = "mean_firing_rates")
    val combos = FeatureExpansion.expand(
      base,
      product = Map(
        "ratio" -> Seq(0.25, 0.50, 0.75),
        "nested_example" -> Seq(
          Map("params" -> Map("bin_size" -> 1)),
          Map("params" -> Map("bin_size" -> 2)))),
      zip = Map("param1" -> Seq(10, 20), "param2" -> Seq(11, 21)))
    assert(combos.map(_.suffix).toSet === goldenSuffixes,
      s"ours=${combos.map(_.suffix).sorted.mkString(",")} " +
        s"golden=${goldenSuffixes.toSeq.sorted.mkString(",")}")
    // zip rows pair positionally like the reference
    assert(combos.filter(_.suffix.endsWith("__1"))
      .forall(c => c.params("param1") == 20 && c.params("param2") == 21))
  }

  test("SomaStats reproduces the committed analysis_05 soma goldens") {
    // reference: external/soma/calculate_features.py — per (sim, circuit,
    // class, window) mean/std (pandas sample std) over a 554k-row report
    val somaBase =
      "/root/reference/tests/functional/data/sonata/expected/analysis_05/soma"
    assume(new java.io.File(somaBase).isDirectory, s"goldens not present")
    def g(p: String): DataFrame = spark.read.parquet(s"$somaBase/$p.parquet")
    val ctx = FeatureCtx(
      spark, groupby = keys, params = Map.empty,
      report = g("repo/report"), windows = g("repo/windows"),
      neurons = g("repo/neurons"), neuronClasses = spark.emptyDataFrame)
    val out = SomaStats.compute(ctx)("by_group")
    val golden = g("features/by_neuron_class")
      .withColumnRenamed("mean", "g_mean").withColumnRenamed("std", "g_std")
    assert(out.count() === golden.count())
    // the goldens store float32 (pandas keeps the report's value dtype
    // through the agg), so parity is float32-limited: ~1e-5 relative on
    // |values| ≈ 60-90 mV plus the float32-accumulation drift
    assertMatch(
      out.join(golden, keys),
      Seq(("mean", "g_mean", 5e-3), ("std", "g_std", 5e-3)))
  }
}
