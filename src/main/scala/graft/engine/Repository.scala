package graft.engine

import graft.dsl.{Q, QSpec, QTrue}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The five canonical extractions as lazy DataFrame builders
  * (reference: src/blueetl/repository.py:334-338 and the extract modules).
  * Dependency DAG: simulations → {neurons → neuron_classes, windows} →
  * report. Everything is one declarative plan per output; the per-
  * simulation fan-out the reference runs in joblib subprocesses
  * (extract/report.py:106-123) is Spark's own partition parallelism here.
  */
final class Repository(
    val spark: SparkSession,
    val campaign: Campaign,
    val cfg: SingleAnalysisConfig,
    val adapter: DataAdapter,
    val simulationsFilter: QSpec = QTrue) {

  import Repository._

  /** One status probe pass over the campaign's resolved paths. Driver-side
    * filesystem reads, not a Spark job; callers take the result ONCE per
    * decision so the statuses they filter on and the statuses they report
    * are the same observation (no TOCTOU between probe passes).
    */
  private def probeStatuses(): Seq[String] =
    campaign.resolvedPaths.map(adapter.status)

  /** Campaign rows × three-valued status (`_status`: COMPLETE / INCOMPLETE
    * / MISSING — reference: extract/simulations.py:22-27,41-86), unfiltered.
    * Condition columns stay open-schema (simulations.py:37-39). A `def`, not
    * a `lazy val`: each call is a LIVE probe — a simulation completing after
    * the first call is visible on the next (the filtered `simulations` view
    * below is pinned lazily, matching the reference's extract-once shape).
    */
  def simulationsWithStatus: DataFrame = simulationsWithStatus(probeStatuses())

  private def simulationsWithStatus(statuses: Seq[String]): DataFrame = {
    val condKeys = campaign.rows.flatMap(_.keys).distinct
      .filterNot(Set("simulation_path", "circuit_path")).sorted
    val paths = campaign.resolvedPaths
    // indexed by row, not by path lookup: two rows sharing a simulation_path
    // must each keep their own circuit_path
    val circuitOf = campaign.rows.zipWithIndex.map { case (r, i) =>
      r.getOrElse("circuit_path", paths(i)).toString
    }
    val distinctCircuits = circuitOf.distinct
    val rows = campaign.rows.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(
        Seq(i, distinctCircuits.indexOf(circuitOf(i)), paths(i), circuitOf(i),
          statuses(i)) ++
          condKeys.map(k => coerce(r.get(k).orNull)))
    }
    val schema = org.apache.spark.sql.types.StructType(
      Seq(
        field("simulation_id", "int"), field("circuit_id", "int"),
        field("simulation_path", "string"), field("circuit_path", "string"),
        field("_status", "string")) ++
        condKeys.map(k => fieldFor(k, campaign.rows.flatMap(_.get(k)).headOption.orNull)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Fresh-extraction view: COMPLETE sims matching `simulations_filter`
    * (reference: extract/simulations.py:115-166 with cached=False — missing
    * AND incomplete sims are dropped, with the counts logged; a CACHED load
    * never re-drops, which the engine honors by reading the dumped frame
    * as-is, see Analyzer.rawDf).
    */
  lazy val simulations: DataFrame = {
    // ONE probe pass feeds both the filter and the ignored-counts log, so
    // they can't disagree (a sim completing between two probes used to be
    // logged as ignored yet extracted, or vice versa)
    val statuses = probeStatuses()
    val byStatus = statuses.groupBy(identity)
    byStatus.get("MISSING").foreach(p =>
      Repository.log.info(s"Simulations ignored because missing: ${p.size}"))
    byStatus.get("INCOMPLETE").foreach(p =>
      Repository.log.info(s"Simulations ignored because incomplete: ${p.size}"))
    Q.q(
      simulationsWithStatus(statuses)
        .filter(col("_status") === "COMPLETE").drop("_status"),
      simulationsFilter)
  }

  /** Distinct (circuit_id, circuit_path) of the selected simulations —
    * driver-side, tiny (reference: extract/neurons.py:135 first-per-circuit).
    */
  private lazy val circuits: Seq[(Int, String)] =
    simulations.select("circuit_id", "circuit_path").distinct()
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq.sortBy(_._1)

  /** Per-class node membership: P1 query over node properties, optional
    * node_id intersection, deterministic seeded limit, per-class index
    * (reference: extract/neurons.py:62-96,139-143). Sampling is md5-rank
    * (SURVEY §7.4: np.random.choice is not distributively reproducible).
    */
  /** Node sets available to class scoping: the analysis-level extra file
    * (S6 — the reference also merges the circuit's own node_sets file;
    * adapters may expose one the same way).
    */
  private lazy val nodeSets: NodeSets =
    cfg.nodeSetsFile.map(NodeSets.fromFile).getOrElse(NodeSets.empty)

  lazy val neurons: DataFrame = {
    val perCircuit = circuits.map { case (cid, cpath) =>
      val nodes = adapter.nodes(spark, cpath)
      val perClass = cfg.neuronClasses.toSeq.sortBy(_._1).map { case (cls, spec) =>
        val scoped = spec.nodeSet.map(nodeSets.select(_, nodes)).getOrElse(nodes)
        var df = Q.q(scoped, spec.query)
        spec.nodeId.foreach { ids => df = df.filter(col("gid").isin(ids: _*)) }
        val lim = spec.limit.orElse(cfg.limit)
        lim.foreach { n =>
          // orderBy+limit compiles to TakeOrderedAndProject — a distributed
          // top-k, not a single-partition row_number pass.
          df = df
            .withColumn("_rk", md5(concat(col("gid").cast("string"), lit(":" + cfg.seed))))
            .orderBy(col("_rk"), col("gid")).limit(n).drop("_rk")
        }
        df.select(lit(cid).as("circuit_id"), lit(cls).as("neuron_class"), col("gid"))
      }
      perClass.reduce(_ unionByName _)
    }
    val all = perCircuit.reduce(_ unionByName _)
    // one window task per (circuit, class); for classes beyond single-task
    // sort capacity (~millions of gids) switch to the two-pass
    // plans/GroupIndex.dense restatement — crossover measured in its
    // scaladoc. Single-class configs fold the partition keys to constants
    // (WindowExec's "No Partition Defined" warning): same execution, just
    // the n=1 case of per-class tasks.
    val w = Window.partitionBy("circuit_id", "neuron_class").orderBy("gid")
    all.withColumn("neuron_class_index", (row_number().over(w) - 1).cast("long"))
  }

  /** Class-level summary: member counts + the class query it came from
    * (reference: extract/neuron_classes.py:53-69, counts A8).
    */
  lazy val neuronClasses: DataFrame = {
    val counts = neurons.groupBy("circuit_id", "neuron_class")
      .agg(count(lit(1)).as("count"))
    val queries = cfg.neuronClasses.toSeq.sortBy(_._1).map { case (cls, spec) =>
      (cls, ConfigIO.canonical(Describe.spec(spec.query)))
    }
    import spark.implicits._
    counts.join(
      broadcast(queries.toDF("neuron_class", "query")), Seq("neuron_class"), "left")
      .select("circuit_id", "neuron_class", "count", "query")
  }

  /** Per-simulation window/trial rows. Static trials shift by
    * trial_steps_value or take explicit `trial_steps_list` offsets;
    * `window_type = "dynamic_onset"` adds a per-simulation onset offset
    * detected from the spikes themselves (the data-dependent two-phase plan
    * of SURVEY §7.4; reference: extract/windows.py:78-111 +
    * external/bnac/calculate_trial_step.py); windows with a
    * `trial_steps_label` add the per-simulation offset computed by the
    * named [[TrialStepsFn]].
    */
  lazy val windows: DataFrame = {
    import spark.implicits._
    val trialRows = cfg.windows.toSeq.sortBy(_._1).flatMap { case (wn, w) =>
      w.stepOffsets.zipWithIndex.map { case (off, k) =>
        (wn, k, w.initialOffset + off,
          w.bounds._1, w.bounds._2, w.duration, w.windowType, w.tStep)
      }
    }
    val wdf = trialRows
      .toDF("window", "trial", "offset", "t_start", "t_stop", "duration", "window_type",
        "t_step")
    val base = simulations.select("simulation_id", "circuit_id")
      .crossJoin(broadcast(wdf))
    val labeled = cfg.windows.toSeq.sortBy(_._1).filter(_._2.trialStepsLabel.nonEmpty)
    val withDynamic = labeled.foldLeft(base) { case (df, (wn, w)) =>
      val ts = cfg.trialSteps.getOrElse(w.trialStepsLabel,
        throw new IllegalArgumentException(
          s"window '$wn' references unknown trial_steps '${w.trialStepsLabel}'"))
      val fn = TrialStepsFns.resolve(ts.function)
      val stepsDf = broadcast(
        w.stepOffsets.zipWithIndex
          .map { case (off, k) => (k, w.initialOffset + off) }
          .toDF("step", "step_base"))
      // spikes inside the trial-steps bounds for each step, rebased to the
      // step's own offset (reference: extract/windows.py:58-75)
      val spk = trialStepsSpikes(ts).join(stepsDf,
        col("time") >= col("step_base") + ts.bounds._1 &&
          col("time") < col("step_base") + ts.bounds._2)
        .select(col("simulation_id"), col("step"),
          (col("time") - col("step_base")).as("time"))
      val dyn = fn.compute(spark, spk, ts)
        .select(col("simulation_id"),
          col("dynamic_offset").cast("double").as("_dyn"))
      df.join(broadcast(dyn), Seq("simulation_id"), "left")
        .withColumn("offset",
          when(col("window") === wn, col("offset") + coalesce(col("_dyn"), lit(0.0)))
            .otherwise(col("offset")))
        .drop("_dyn")
    }
    val needsOnset = cfg.windows.values.exists(_.windowType == "dynamic_onset")
    if (!needsOnset) withDynamic
    else {
      val base = withDynamic
      // Phase 1: per-simulation onset scalar = first time-bin (width = the
      // window's duration/100) whose spike count exceeds mean+2σ of the
      // first 25 bins. Collected driver-side, then joined back (tiny).
      val binW = cfg.windows.values.map(_.duration).max / 100.0
      val hist = allSpikes
        .withColumn("bin", floor(col("time") / binW))
        .groupBy("simulation_id", "bin").agg(count(lit(1)).as("cnt"))
      val basestats = hist.filter(col("bin") < 25)
        .groupBy("simulation_id")
        .agg(avg("cnt").as("mu"), stddev_pop("cnt").as("sd"))
      val onsets = hist.join(basestats, "simulation_id")
        .filter(col("bin") >= 25 && col("cnt") > col("mu") + lit(2) * col("sd"))
        .groupBy("simulation_id")
        .agg((min("bin") * binW).as("onset"))
      base.join(broadcast(onsets), Seq("simulation_id"), "left")
        .withColumn("offset",
          when(col("window_type") === "dynamic_onset",
            col("offset") + coalesce(col("onset"), lit(0.0)))
            .otherwise(col("offset")))
        .drop("onset")
    }
  }

  /** Spikes visible to a trial-steps function: all spikes, or the
    * node-set/limit-scoped subset (reference: extract/windows.py:24-55
    * `_load_dynamic_gids` — same node_set + deterministic limit semantics
    * as neuron classes, semi-joined against the events).
    */
  private def trialStepsSpikes(ts: TrialStepsSpec): DataFrame =
    if (ts.nodeSet.isEmpty && ts.limit.isEmpty) allSpikes
    else {
      val gids = circuits.map { case (cid, cpath) =>
        val nodes = adapter.nodes(spark, cpath)
        val scoped = ts.nodeSet.map(nodeSets.select(_, nodes)).getOrElse(nodes)
        val limited = ts.limit.map { n =>
          scoped
            .withColumn("_rk", md5(concat(col("gid").cast("string"), lit(":" + cfg.seed))))
            .orderBy(col("_rk"), col("gid")).limit(n).drop("_rk")
        }.getOrElse(scoped)
        limited.select(lit(cid).as("circuit_id"), col("gid"))
      }.reduce(_ unionByName _)
      allSpikes.join(broadcast(gids), Seq("circuit_id", "gid"), "left_semi")
    }

  /** All simulations' spike events tagged with ids — the per-subprocess
    * materialization of the reference (extract/report.py:126-158). Bulk
    * path (one multi-path scan + file→sim mapping) when the adapter
    * supports it — keeps the plan a single FileScan for 1000+-simulation
    * campaigns; otherwise a per-simulation scan union.
    */
  private lazy val allSpikes: DataFrame = {
    val sims = simulations.select("simulation_id", "circuit_id", "simulation_path")
      .collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    adapter.spikesBulk(spark, sims).getOrElse {
      sims.map { case (sid, cid, path) =>
        adapter.spikes(spark, path)
          .select(
            lit(sid).as("simulation_id"), lit(cid).as("circuit_id"),
            col("time"), col("gid"))
      }.reduce(_ unionByName _)
    }
  }

  private lazy val allFrames: DataFrame = {
    val sims = simulations.select("simulation_id", "circuit_id", "simulation_path")
      .collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    adapter.framesBulk(spark, sims).getOrElse {
      sims.map { case (sid, cid, path) =>
        val f = adapter.frames(spark, path)
        val extra = if (f.columns.contains("section")) Seq(col("section")) else Nil
        f.select(
          Seq(
            lit(sid).as("simulation_id"), lit(cid).as("circuit_id"),
            col("time"), col("gid"), col("value")) ++ extra: _*)
      }.reduce(_ unionByName _)
    }
  }

  /** The report extraction: events range-joined into window/trials (J4),
    * time rebased, classes attached via the neurons join
    * (reference: extract/spikes.py:19-56, soma_report.py:42-53).
    * Windows are genuinely tiny (sims × windows × trials) → broadcast
    * hint. Neurons are NOT hinted: usually thousands of rows, but a
    * no-limit class over a 100× campaign can be millions — AQE broadcasts
    * at runtime when the measured size is small and shuffles otherwise.
    */
  lazy val report: DataFrame = {
    val events0 = if (cfg.reportType == "spikes") allSpikes else allFrames
    // the window join's range predicates compare to the windows table, so
    // they can't push into the scan — but with only static windows the
    // global envelope [min(offset+t_start), max(offset+t_stop)) is a
    // config-time constant, and a literal prefilter reaches the
    // sonata-spikes / sonata-frames readers as a plan-time row-range
    // collapse (the reference pushes t_start/t_stop into bluepysnap the
    // same way, adapters/impl/bluepysnap/simulation.py:42-60)
    val dynamic = cfg.windows.values.exists(w =>
      w.trialStepsLabel.nonEmpty || w.windowType == "dynamic_onset")
    val events =
      if (dynamic || cfg.windows.isEmpty) events0
      else {
        val spans = for {
          w <- cfg.windows.values.toSeq
          off <- w.stepOffsets.map(w.initialOffset + _)
        } yield (off + w.bounds._1, off + w.bounds._2)
        events0.filter(
          col("time") >= spans.map(_._1).min && col("time") < spans.map(_._2).max)
      }
    val extra = Seq("value", "section").filter(events.columns.contains)
    val w = broadcast(windows)
    val joined = events.alias("e").join(
      w.alias("w"),
      col("e.simulation_id") === col("w.simulation_id") &&
        col("e.circuit_id") === col("w.circuit_id") &&
        col("e.time") >= col("w.offset") + col("w.t_start") &&
        col("e.time") < col("w.offset") + col("w.t_stop"))
    // S3 t_step subsampling (frame reports): keep samples on the t_step
    // grid relative to the window start; 0 = keep everything
    val onGrid = col("w.t_step") === 0.0 ||
      abs(pmod(col("e.time") - col("w.offset") - col("w.t_start"), col("w.t_step"))) < 1e-9
    joined.filter(onGrid).select(
      Seq(
        col("e.simulation_id").as("simulation_id"), col("e.circuit_id").as("circuit_id"),
        col("w.window").as("window"), col("w.trial").as("trial"),
        (col("e.time") - col("w.offset")).as("time"), col("e.gid").as("gid")) ++
        extra.map(n => col(s"e.$n").as(n)): _*)
      .join(neurons.select("circuit_id", "neuron_class", "gid"),
        Seq("circuit_id", "gid"))
      .select(
        (Seq("simulation_id", "circuit_id", "neuron_class", "window", "trial", "time", "gid") ++
          extra).map(col): _*)
  }

  /** Windows invariant checks (A9 — reference: extract/windows.py:130-144):
    * per window, t_start/t_stop/duration are unique across simulations and
    * trials; per (simulation, window), trials are exactly 0..n-1. Throws on
    * violation; one aggregation job.
    */
  def validateWindows(): Unit = {
    val bad = windows.groupBy("window")
      .agg(
        countDistinct("t_start", "t_stop", "duration").as("n_bounds"))
      .filter(col("n_bounds") > 1)
      .collect()
    require(bad.isEmpty, s"windows with inconsistent bounds: ${bad.mkString(",")}")
    val badTrials = windows.groupBy("simulation_id", "window")
      .agg(
        count(lit(1)).as("n"), countDistinct("trial").as("nd"),
        min("trial").as("mn"), max("trial").as("mx"))
      .filter(col("nd") =!= col("n") || col("mn") =!= 0 || col("mx") =!= col("n") - 1)
      .collect()
    require(badTrials.isEmpty, s"non-contiguous trials: ${badTrials.mkString(",")}")
  }

  /** All five, in dependency order (reference: repository.py:334-338). */
  def names: Seq[String] = Repository.Names
  def df(name: String): DataFrame = name match {
    case "simulations" => simulations
    case "neurons" => neurons
    case "neuron_classes" => neuronClasses
    case "windows" => windows
    case "report" => report
  }
}

object Repository {
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[Repository])

  val Names: Seq[String] = Seq("simulations", "neurons", "neuron_classes", "windows", "report")

  private def coerce(v: Any): Any = v match {
    case n: java.lang.Integer => n.longValue()
    case n: java.lang.Long => n
    case n: java.lang.Double => n
    case n: java.lang.Float => n.doubleValue()
    case b: java.lang.Boolean => b
    case null => null
    case other => other.toString
  }

  private def field(n: String, t: String) =
    org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.DataType.fromDDL(t))

  private def fieldFor(n: String, sample: Any) = sample match {
    case _: java.lang.Integer | _: java.lang.Long => field(n, "bigint")
    case _: java.lang.Double | _: java.lang.Float => field(n, "double")
    case _: java.lang.Boolean => field(n, "boolean")
    case _ => field(n, "string")
  }
}
