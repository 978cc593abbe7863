package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StructType}

/** The feature-function surface (reference UDTF contract:
  * src/blueetl/features.py:392-446 `_user_func_wrapper` — a python callable
  * per group key over the merged neurons×windows×report frame).
  *
  * Spark-first restatement: a feature function receives the *whole* scoped
  * report plus the small dimension tables and returns complete feature
  * DataFrames grouped by the configured keys — the reference's per-group
  * loop becomes `groupBy(keys)` inside the function, so Catalyst plans one
  * distributed aggregation instead of a driver-side loop. Truly opaque
  * per-group code uses [[FeatureFns.rowUdtf]] (groupByKey.flatMapGroups),
  * the explicitly-non-relational escape hatch (SURVEY §2.11 X1).
  */
final case class FeatureCtx(
    spark: SparkSession,
    groupby: Seq[String],
    params: Map[String, Any],
    report: DataFrame,   // scoped to the spec's windows/neuron_classes (P6)
    windows: DataFrame,
    neurons: DataFrame,
    neuronClasses: DataFrame)

trait FeatureFn extends Serializable {
  /** name → feature DataFrame; key columns must lead (etl.add_conditions
    * parity — reference: features.py:434-439).
    */
  def compute(ctx: FeatureCtx): Map[String, DataFrame]

  /** Lazily-constructed variant: ordered (name, thunk) pairs so a caller
    * that evaluates one output frame never pays Catalyst plan construction
    * for its siblings. Default = strict (fine for single-frame fns); fns
    * emitting several expensive frames override with per-frame thunks.
    */
  def computeLazy(ctx: FeatureCtx): Seq[(String, () => DataFrame)] =
    compute(ctx).toSeq.map { case (k, df) => (k, () => df) }
}

object FeatureFns {

  /** Registry: short names here, or any fully-qualified class name of a
    * [[FeatureFn]] (reflection — reference: utils.py:146-156
    * `import_by_string`).
    */
  def resolve(name: String): FeatureFn = builtin.getOrElse(name,
    Class.forName(name).getDeclaredConstructor().newInstance().asInstanceOf[FeatureFn])

  val builtin: Map[String, FeatureFn] = Map(
    "mean_firing_rates" -> MeanFiringRates,
    "spike_stats" -> SpikeStats,
    "histograms" -> Histograms,
    "smoothed_histograms" -> SmoothedHistograms,
    "soma_stats" -> SomaStats,
    "pairwise_correlation" -> PairwiseCorrelationFeature,
    "pairwise_distances" -> PairwiseDistanceFeature)

  /** Escape hatch for opaque per-group logic: groupByKey on the configured
    * keys + flatMapGroups, with an explicit output schema. Rows arrive
    * sorted within each group only if `sortWithinGroup` is set.
    */
  def rowUdtf(
      groupby: Seq[String],
      outSchema: StructType,
      f: (Row, Iterator[Row]) => Iterator[Row]): FeatureFn = new FeatureFn {
    def compute(ctx: FeatureCtx): Map[String, DataFrame] = {
      val df = ctx.report
      val keySchema = StructType(groupby.map(n => df.schema(n)))
      val keyEnc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(keySchema))
      val outEnc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
      val keyed = df.groupByKey { r: Row =>
        Row.fromSeq(groupby.map(n => r.getAs[Any](n)))
      }(keyEnc)
      Map("udtf" -> keyed.flatMapGroups { (k: Row, it: Iterator[Row]) => f(k, it) }(outEnc).toDF())
    }
  }
}

/** The bnac five-frame feature family
  * (reference: external/bnac/calculate_features.py:16-179 — counts and first
  * spike per trial, means across trials with absent-trial zero fill, rates
  * from window duration, class-level mean/std with population σ, per-trial
  * spike lists and class means, and the normalized/smoothed PSTH frame).
  * Emits the reference's five output names: `by_gid`, `by_gid_and_trial`,
  * `by_neuron_class`, `by_neuron_class_and_trial`, `histograms`.
  *
  * Params: `hist_bin_size` (report time units per histogram bin, default 1
  * matching the reference's 1 ms bins over ms times), `sigma` (gaussian
  * smoothing width in bins, default 4 like bnac).
  */
object MeanFiringRates extends FeatureFn {
  def compute(ctx: FeatureCtx): Map[String, DataFrame] =
    computeLazy(ctx).map { case (k, t) => k -> t() }.toMap

  /** Per-frame thunks over shared lazy subplans: evaluating `by_gid` builds
    * only the count/universe chain; the PSTH subplans (kernel toDF, extent,
    * smoothing joins) are constructed on first access to `histograms` /
    * `by_neuron_class`. Strict five-frame construction cost the flagship
    * by_gid query a constant ~0.4 s/call in the r12 bench.
    */
  override def computeLazy(ctx: FeatureCtx): Seq[(String, () => DataFrame)] = {
    val keys = ctx.groupby.filterNot(_ == "gid")
    lazy val perTrial = ctx.report
      .groupBy((keys :+ "trial").map(col) :+ col("gid"): _*)
      .agg(
        count(lit(1)).as("cnt"), min("time").as("first_spike"),
        sort_array(collect_list(col("time"))).as("times"))
    // universe = member gids × window trials, so silent gids/trials = 0
    lazy val members = ctx.neurons.select("circuit_id", "neuron_class", "gid")
    lazy val trials = ctx.windows
      .select("simulation_id", "circuit_id", "window", "trial", "duration").distinct()
    lazy val universe = trials.join(members, Seq("circuit_id"))
    // by_gid_and_trial: spiking rows only by default (the reference's
    // dropna under export_all_neurons=False, calculate_features.py:117-124);
    // with export_all_neurons=true every universe (trial, gid) appears
    // with count 0 / null first spike / empty list — the reference's
    // merged neurons×windows×report input makes silent rows first-class
    // (features.py:418, functional goldens analysis_01)
    val exportAll = ctx.params.get("export_all_neurons").exists {
      case b: java.lang.Boolean => b
      case s => s.toString.toBoolean
    }
    val gidTrialCols = ((keys :+ "trial") :+ "gid").map(col) ++ Seq(
      col("cnt").as("count"), col("first_spike"), col("times"))
    lazy val byGidTrial =
      if (!exportAll) perTrial.select(gidTrialCols: _*)
      else universe.drop("duration")
        .join(perTrial, (keys :+ "trial") :+ "gid", "left")
        .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
        .withColumn("times",
          coalesce(col("times"), expr("CAST(array() AS array<double>)")))
        .select(gidTrialCols: _*)
    lazy val filled = universe.join(
        perTrial.drop("times"), (keys :+ "trial") :+ "gid", "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    lazy val byGid = filled
      .groupBy((keys :+ "gid").map(col) :+ col("duration"): _*)
      .agg(
        avg("cnt").as("mean_count"),
        avg("first_spike").as("mean_first_spike"))
      .withColumn("mean_firing_rate", col("mean_count") * lit(1000.0) / col("duration"))
      .drop("duration")
    // by_neuron_class_and_trial: mean spike count over the gid universe per
    // trial (reference mean_of_spike_counts_for_each_trial, line 38-44)
    lazy val byClassTrial = filled
      .groupBy((keys :+ "trial").map(col): _*)
      .agg(graft.queries.davg(col("cnt")).as("mean_of_spike_counts"))
    // ---- the PSTH frame: counts per bin normalized by (class members ×
    // window trials), its max-normalized form, and the gaussian-smoothed
    // max-normalized form (calculate_features.py:67-93) ----
    val binSize = ctx.params.get("hist_bin_size").map {
      case n: Number => n.doubleValue()
    }.getOrElse(1.0)
    val sigma = ctx.params.get("sigma").map {
      case n: Number => n.doubleValue()
    }.getOrElse(4.0)
    // bins are RELATIVE to each window's t_start (bin 0 = [t_start,
    // t_start+binSize)), matching np.histogram(range=[t_start, t_stop])
    // in the reference — the standalone Histograms feature keeps its
    // absolute-bin contract
    val winCols = Seq("simulation_id", "circuit_id", "window").filter(keys.contains)
    lazy val spans = ctx.windows
      .select(winCols.map(col) :+ col("t_start") :+
        (ceil((col("t_stop") - col("t_start")) / binSize).cast("long") - 1)
          .as("bin_hi"): _*)
      .distinct()
    lazy val binned = ctx.report
      .join(broadcast(spans), winCols)
      .withColumn("bin",
        floor((col("time") - col("t_start")) / binSize).cast("long"))
      .groupBy(keys.map(col) :+ col("bin"): _*)
      .agg(count(lit(1)).as("cnt"))
    // (Scratch-materializing this frame was TRIED in r20 and measured
    // SLOWER — e16 1.74 s → 2.33 s warm: with the sort shuffle writer
    // the ~8 aliased re-derivations are cheaper than one parquet write
    // round-trip at this frame's size.)
    lazy val dense = ctx.report.select(keys.map(col): _*).distinct()
      .join(broadcast(spans), winCols)
      .withColumn("bin", explode(sequence(lit(0L), col("bin_hi"))))
      .drop("bin_hi", "t_start")
      .join(binned, keys :+ "bin", "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    lazy val nTrials = ctx.windows
      .groupBy(Seq("simulation_id", "circuit_id", "window")
        .filter(keys.contains).map(col): _*)
      .agg(countDistinct("trial").as("n_trials"))
    lazy val nCells = ctx.neurons
      .groupBy(Seq("circuit_id", "neuron_class").filter(keys.contains).map(col): _*)
      .agg(count(lit(1)).as("n_cells"))
    lazy val withHist = dense
      .join(broadcast(nTrials),
        nTrials.columns.filterNot(_ == "n_trials").toSeq)
      .join(broadcast(nCells),
        nCells.columns.filterNot(_ == "n_cells").toSeq)
      .withColumn("hist", col("cnt") / (col("n_cells") * col("n_trials")))
      .drop("cnt", "n_cells", "n_trials")
    // per-group extrema; argmax = FIRST bin attaining the max (np.argmax)
    lazy val grpStats = withHist.groupBy(keys.map(col): _*)
      .agg(
        // davg18: hist values are ~rate×bin_seconds (often ≤1e-5) — the
        // 1e-6 grid of the plain davg would distort or zero them
        graft.queries.davg18(col("hist")).as("mean_of_hist"),
        min("hist").as("min_of_hist"),
        max("hist").as("max_of_hist"),
        (-max(struct(col("hist").as("h"), (-col("bin")).as("nb")))
          .getField("nb")).as("argmax_bin"))
    // smoothing is linear and max-normalization scale-invariant, so
    // smoothing raw counts then dividing by their max equals the
    // reference's gaussian_filter over the normalized hist
    lazy val smoothed = SmoothedHistograms.smooth(ctx.spark, dense, keys, sigma)
    lazy val smMax = smoothed.groupBy(keys.map(col): _*)
      .agg(max("smoothed").as("max_sm"))
    lazy val histograms = withHist
      .join(grpStats.select((keys :+ "max_of_hist").map(col): _*), keys)
      .join(smoothed, keys :+ "bin")
      .join(smMax, keys)
      .select(keys.map(col) ++ Seq(
        col("bin"), col("hist"),
        when(col("max_of_hist") === 0, col("hist"))
          .otherwise(col("hist") / col("max_of_hist")).as("max_normalised_hist"),
        when(col("max_sm") === 0, col("smoothed"))
          .otherwise(col("smoothed") / col("max_sm"))
          .as("smoothed_max_normalised_hist")): _*)
    // Class-level reduction uses order-independent decimal sums (E[x²]−E[x]²
    // population σ): double avg/stddev_pop accumulate in partial-aggregation
    // order, which is nondeterministic across partitionings and differs from
    // any single-threaded reference computation.
    val r = col("mean_firing_rate")
    val m = graft.queries.davg(r)
    val m2 = graft.queries.davg(r * r)
    lazy val byClass = byGid.groupBy(keys.map(col): _*)
      .agg(
        graft.queries.davg(col("mean_count")).as("mean_of_mean_spike_counts"),
        m.as("mean_of_mean_firing_rates"),
        sqrt(greatest(m2 - m * m, lit(0.0))).as("std_of_mean_firing_rates"),
        graft.queries.davg(col("mean_first_spike")).as("mean_of_mean_first_spikes"))
      // the four histogram scalars the reference merges into by_neuron_class
      // (calculate_features.py:130-155); left join — a class/window group
      // with no spikes at all has no histogram rows
      .join(grpStats, keys, "left")
    Seq(
      "by_gid" -> (() => byGid),
      "by_gid_and_trial" -> (() => byGidTrial),
      "by_neuron_class" -> (() => byClass),
      "by_neuron_class_and_trial" -> (() => byClassTrial),
      "histograms" -> (() => histograms))
  }
}

/** Per-gid spiketrain statistics: spike count, MFR over the window, ISI
  * mean/CV, LV (reference: external/bluecv/gid.py:14-61).
  */
object SpikeStats extends FeatureFn {
  def compute(ctx: FeatureCtx): Map[String, DataFrame] = {
    import org.apache.spark.sql.expressions.Window
    val keys = ctx.groupby.filterNot(_ == "gid")
    val w = Window.partitionBy((keys :+ "gid").map(col): _*).orderBy("time")
    val withIsi = ctx.report
      .withColumn("isi", col("time") - lag("time", 1).over(w))
      .withColumn("prev_isi", lag("isi", 1).over(w))
    val dur = ctx.windows.select("window", "duration").distinct()
    val ratio = (col("isi") - col("prev_isi")) /
      when(col("isi") + col("prev_isi") =!= 0, col("isi") + col("prev_isi"))
    val byGid = withIsi
      .groupBy((keys :+ "gid").map(col): _*)
      .agg(
        count(lit(1)).as("spike_count"),
        avg("isi").as("mean_isi"),
        (stddev_pop("isi") / avg("isi")).as("cv"),
        (lit(3) * avg(pow(ratio, 2))).as("lv"))
      .join(broadcast(dur), Seq("window"))
      .withColumn("mfr", col("spike_count") * lit(1000.0) / col("duration"))
      .drop("duration")
    Map("by_gid" -> byGid)
  }
}

/** Dense per-group PSTH with configurable bin size
  * (reference: external/bnac/calculate_features.py:67-93,
  * bluecv/neuron_class.py:58-79). params: bin_size (report time units).
  */
object Histograms extends FeatureFn {
  def compute(ctx: FeatureCtx): Map[String, DataFrame] = {
    val binSize = ctx.params.get("bin_size").map {
      case n: Number => n.doubleValue()
    }.getOrElse(1.0)
    val keys = ctx.groupby.filterNot(_ == "gid")
    val binned = ctx.report
      .withColumn("bin", floor((col("time") - lit(0.0)) / binSize).cast("long"))
      .groupBy(keys.map(col) :+ col("bin"): _*)
      .agg(count(lit(1)).as("cnt"))
    // dense fill: every group × every bin in its window span
    val spans = ctx.windows
      .select(
        col("simulation_id"), col("circuit_id"), col("window"),
        floor(col("t_start") / binSize).cast("long").as("bin_lo"),
        (ceil(col("t_stop") / binSize).cast("long") - 1).as("bin_hi"))
      .distinct()
    val groups = ctx.report.select(keys.map(col): _*).distinct()
      .join(broadcast(spans),
        spans.columns.filter(c => keys.contains(c) && c != "bin_lo" && c != "bin_hi").toSeq)
    val dense = groups
      .withColumn("bin", explode(sequence(col("bin_lo"), col("bin_hi"))))
      .drop("bin_lo", "bin_hi")
      .join(binned, keys :+ "bin", "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    Map("histograms" -> dense)
  }
}

/** Dense PSTH + gaussian smoothing with scipy reflect boundary —
  * the A5→A6 composition as one feature (reference:
  * external/bnac/calculate_features.py:67-93, sigma via params.sigma,
  * radius = int(4σ+0.5), relational kernel join, no UDF).
  * params: bin_size, sigma (in bins).
  */
object SmoothedHistograms extends FeatureFn {

  /** Reflect-boundary gaussian smoothing of a dense per-group histogram
    * frame (keys…, bin, cnt) → (keys…, bin, smoothed); kernel weights are
    * driver-computed constants, radius = int(4σ+0.5) like scipy's.
    */
  def smooth(spark: SparkSession, dense: DataFrame, keys: Seq[String],
      sigma: Double): DataFrame = {
    val radius = (4 * sigma + 0.5).toInt
    // kernel weights are constants — driver-computed, no global window
    val kernel = {
      import spark.implicits._
      val ks = -radius to radius
      val w0 = ks.map(k => math.exp(-(k * k) / (2.0 * sigma * sigma)))
      val tot = w0.sum
      ks.zip(w0.map(_ / tot)).toDF("k", "w")
    }
    // per-group bin extent for the reflect boundary
    val extent = dense.groupBy(keys.map(col): _*)
      .agg(min("bin").as("lo"), max("bin").as("hi"))
    val idx = col("bin") + col("k")
    // scipy's 'reflect' tiles the signal infinitely (dcba|abcd|dcba…);
    // the closed form folds any index into [lo, hi] in one step, exact
    // for radii LARGER than the group extent too (a single reflection
    // would leave such taps out of range and the join would silently
    // drop kernel mass)
    val n = col("hi") - col("lo") + lit(1L)
    val m = pmod(idx - col("lo"), lit(2L) * n)
    val reflect = col("lo") +
      when(m < n, m).otherwise(lit(2L) * n - lit(1L) - m)
    val src = dense.select(
      (keys.map(n => col(n).as(s"s_$n")) :+ col("bin").as("s_bin")) :+ col("cnt").as("s_cnt"): _*)
    val joinCond = keys.map(n => col(n) === col(s"s_$n")).reduce(_ && _) &&
      col("s_bin") === col("src_bin")
    dense.join(extent, keys)
      .crossJoin(broadcast(kernel))
      .withColumn("src_bin", reflect)
      .join(src, joinCond)
      .groupBy((keys :+ "bin").map(col): _*)
      // decimal-routed sum: double addition is order-sensitive and the
      // partial-aggregation order varies run to run; rounding each of the
      // ≤(2r+1) products to 1e-18 makes the result bit-deterministic at
      // ~1e-17 worst-case error
      .agg(sum((col("s_cnt") * col("w")).cast(DecimalType(38, 18)))
        .cast("double").as("smoothed"))
  }

  def compute(ctx: FeatureCtx): Map[String, DataFrame] = {
    val sigma = ctx.params.get("sigma").map {
      case n: Number => n.doubleValue()
    }.getOrElse(4.0)
    val dense = Histograms.compute(ctx)("histograms")
    val keys = ctx.groupby.filterNot(_ == "gid")
    Map("smoothed_histograms" -> smooth(ctx.spark, dense, keys, sigma))
  }
}

/** Frame-report value statistics per group
  * (reference: external/soma/calculate_features.py:10-15; pandas std there
  * is the sample std — kept).
  */
object SomaStats extends FeatureFn {
  def compute(ctx: FeatureCtx): Map[String, DataFrame] = {
    val byClass = ctx.report
      .groupBy(ctx.groupby.map(col): _*)
      .agg(avg("value").as("mean"), stddev("value").as("std"),
        min("value").as("min"), max("value").as("max"))
    Map("by_group" -> byClass)
  }
}

/** Class-level pairwise Pearson correlation of binned spike counts — the
  * reference computes full-class correlation matrices as a feature per
  * neuron_class (external/bluecv/neuron_class.py:47-49, wired through
  * features.py:392-446); here it is the blocked Gram expansion of
  * [[graft.queries.Spikes.pairwiseCorrelation]] grouped by the configured
  * keys, so one distributed plan covers every class/window at once.
  *
  * Params: `bin_size` (time units per bin), `n_bins`, `n_blocks` (the
  * per-task memory knob of the blocked expansion). Multi-trial windows
  * should include `trial` in `groupby` to correlate within trials.
  */
object PairwiseCorrelationFeature extends FeatureFn {
  def compute(ctx: FeatureCtx): Map[String, DataFrame] = {
    val keys = ctx.groupby.filterNot(_ == "gid")
    def num(name: String, dflt: Double): Double =
      ctx.params.get(name).map(_.toString.toDouble).getOrElse(dflt)
    val binSize = num("bin_size", 3600000000.0)
    val nBins = num("n_bins", 24).toInt
    val nBlocks = num("n_blocks", 8).toInt
    val binned = ctx.report
      .withColumn("bin", floor(col("time") / lit(binSize)).cast("int"))
      .filter(col("bin") >= 0 && col("bin") < nBins)
      .groupBy(keys.map(col) :+ col("gid") :+ col("bin"): _*)
      .agg(count(lit(1)).as("cnt"))
    Map("by_pair" -> graft.queries.Spikes.pairwiseCorrelation(
      binned, nBins = nBins, nBlocks = nBlocks, keys = keys))
  }
}

/** Class-level Van Rossum / Victor-Purpura distance matrices as features
  * (reference: external/bluecv/comparison.py:11-21 per neuron_class) —
  * per-gid sorted trains aggregated once, then the blocked equi-join pair
  * expansion grouped by the configured keys; VR self-kernels are computed
  * once per gid, VP runs the codegen `vp_distance` Expression.
  *
  * Params: `metric` ("van_rossum" | "victor_purpura"), `tau` (VR kernel
  * width), `q` (VP shift cost), `n_blocks`.
  */
object PairwiseDistanceFeature extends FeatureFn {
  def compute(ctx: FeatureCtx): Map[String, DataFrame] = {
    graft.functions.GraftFunctions.register(ctx.spark)
    val keys = ctx.groupby.filterNot(_ == "gid")
    def num(name: String, dflt: Double): Double =
      ctx.params.get(name).map(_.toString.toDouble).getOrElse(dflt)
    val nBlocks = num("n_blocks", 8).toInt
    val metric = ctx.params.getOrElse("metric", "van_rossum").toString
    val trains0 = ctx.report
      .groupBy(keys.map(col) :+ col("gid"): _*)
      .agg(sort_array(collect_list(col("time").cast("double"))).as("train"))
    metric match {
      case "van_rossum" =>
        val tau = num("tau", 3600000000.0)
        val trains = trains0.withColumn(
          "kk", graft.queries.Spikes.vrKernel("train", "train", tau))
        Map("by_pair" -> graft.queries.Spikes
          .blockedSelfPairs(trains, nBlocks = nBlocks, keys = keys)
          .select(keys.map(col) :+ col("gid1") :+ col("gid2") :+
            (col("kk1") + col("kk2") -
              lit(2) * graft.queries.Spikes.vrKernel("train1", "train2", tau)).as("vr2"): _*))
      case "victor_purpura" =>
        val q = num("q", 1.0 / 3600000000.0)
        Map("by_pair" -> graft.queries.Spikes
          .blockedSelfPairs(trains0, nBlocks = nBlocks, keys = keys)
          .select(keys.map(col) :+ col("gid1") :+ col("gid2") :+
            expr(s"vp_distance(train1, train2, ${q}d)").as("vp"): _*))
      case other => throw new IllegalArgumentException(
        s"pairwise_distances: unknown metric '$other' " +
          "(van_rossum | victor_purpura)")
    }
  }
}

/** Feature-config expansion + the union view over per-combo outputs
  * (reference: params_product/params_zip, config/analysis.py:132-170, and
  * ConcatenatedFeatures, features.py:36-116).
  */
object FeatureExpansion {

  /** Expand one raw spec map's params_product / params_zip into concrete
    * FeaturesSpec combos, with the REFERENCE's suffix scheme
    * (config/analysis.py:132-170): one `_{value_index}` per product key in
    * key order, then `__{row_index}` for the zip — so a campaign written
    * against blueetl's cached feature names (`by_gid_0_1__0.parquet`,
    * functional goldens analysis_09) reads ours unchanged. Zip lists must
    * share one length (the reference raises on mismatch too).
    */
  def expand(spec: FeaturesSpec, product: Map[String, Seq[Any]], zip: Map[String, Seq[Any]]): Seq[FeaturesSpec] = {
    val productCombos: Seq[(Map[String, Any], String)] =
      product.foldLeft(Seq((Map.empty[String, Any], ""))) { case (acc, (k, vs)) =>
        for ((m, sfx) <- acc; (v, i) <- vs.zipWithIndex)
          yield (m + (k -> v), sfx + s"_$i")
      }
    val zipCombos: Seq[(Map[String, Any], String)] =
      if (zip.isEmpty) Seq((Map.empty, ""))
      else {
        require(zip.values.map(_.size).toSet.size == 1,
          "All the zip params must have the same length")
        val n = zip.values.head.size
        (0 until n).map(i =>
          (zip.map { case (k, vs) => k -> vs(i) }, s"__$i"))
      }
    val combos =
      for ((pm, ps) <- productCombos; (zm, zs) <- zipCombos)
        yield (pm ++ zm, ps + zs)
    if (combos == Seq((Map.empty, "")))  Seq(spec)
    else combos.map { case (extra, sfx) =>
      spec.copy(params = spec.params ++ extra, suffix = sfx)
    }
  }

  /** The ConcatenatedFeatures view: per-combo outputs unioned with their
    * varying params as literal columns (J6 broadcast-params join).
    */
  def concatView(outputs: Seq[(Map[String, Any], DataFrame)]): DataFrame =
    outputs.map { case (params, df) =>
      params.toSeq.sortBy(_._1).foldLeft(df) { case (d, (k, v)) =>
        d.withColumn(k, lit(v))
      }
    }.reduce(_ unionByName (_, true))
}
