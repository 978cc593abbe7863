package graft.engine

import graft.SparkSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** trial_steps_list / trial_steps_label windows (reference:
  * analysis_model.py:82-127, extract/windows.py:168-187): explicit offset
  * lists, the validation rules, named trial-steps functions (built-in and
  * dotted-path), and node-set/limit scoping of the dynamic spikes.
  */
class TrialStepsWindowsSpec extends SparkSuite {

  private def mkSims(dir: String): Campaign = {
    import spark.implicits._
    // sim0 first spike at t=100, sim1 at t=300
    for ((p, first) <- Seq((0, 100.0), (1, 300.0)))
      ((0 until 50).map(i => (first + i * 10.0, (i % 3).toLong)))
        .toDF("time", "gid").write.mode("overwrite").parquet(s"$dir/sim$p")
    Seq(0L, 1L, 2L).toDF("gid").write.mode("overwrite").parquet(s"$dir/nodes")
    Campaign("ts", dir, Map.empty, Seq(
      Map("simulation_path" -> "sim0", "circuit_path" -> s"$dir/nodes"),
      Map("simulation_path" -> "sim1", "circuit_path" -> s"$dir/nodes")))
  }

  test("trial_steps_list: one trial per entry at initial_offset + entry") {
    val dir = Files.createTempDirectory("graft-tsl").toString
    val campaign = mkSims(dir)
    val cfg = SingleAnalysisConfig(
      name = "s", reportType = "spikes",
      windows = Map("w" -> WindowSpec(
        bounds = (0.0, 50.0), initialOffset = 5.0,
        trialStepsList = Seq(0.0, 120.0, 400.0))),
      neuronClasses = Map("all" -> NeuronClassSpec()),
      features = Nil)
    val w = new Repository(spark, campaign, cfg, new ParquetAdapter)
      .windows.filter(col("simulation_id") === 0)
      .select("trial", "offset").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toMap
    assert(w === Map(0 -> 5.0, 1 -> 125.0, 2 -> 405.0))
  }

  test("validation: list is exclusive with n_trials/trial_steps_value") {
    intercept[IllegalArgumentException] {
      WindowSpec(bounds = (0.0, 1.0), trialStepsList = Seq(1.0), nTrials = 2,
        trialStepsValue = 5.0)
    }
    intercept[IllegalArgumentException] {
      WindowSpec(bounds = (0.0, 1.0), nTrials = 3) // no trial_steps_value
    }
    // config layer rejects raw keys even at default values
    val dir = Files.createTempDirectory("graft-tsv").toString
    Files.writeString(Paths.get(dir, "bad.yaml"),
      """simulation_campaign: x
        |output: y
        |analysis:
        |  a:
        |    extraction:
        |      report: {type: spikes}
        |      neuron_classes: {all: {}}
        |      windows:
        |        w: {bounds: [0, 1], trial_steps_list: [1, 2], n_trials: 1}
        |""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      ConfigIO.loadAnalysis(s"$dir/bad.yaml")
    }
    assert(e.getMessage.contains("trial_steps_list cannot be set"))
  }

  test("validation: unknown label and forbidden initial_offset fail fast") {
    val dir = Files.createTempDirectory("graft-tsv2").toString
    Files.writeString(Paths.get(dir, "unknown.yaml"),
      """simulation_campaign: x
        |output: y
        |analysis:
        |  a:
        |    extraction:
        |      report: {type: spikes}
        |      neuron_classes: {all: {}}
        |      windows:
        |        w: {bounds: [0, 1], trial_steps_label: nope}
        |""".stripMargin)
    assert(intercept[IllegalArgumentException] {
      ConfigIO.loadAnalysis(s"$dir/unknown.yaml")
    }.getMessage.contains("unknown trial_steps"))
    Files.writeString(Paths.get(dir, "forbidden.yaml"),
      """simulation_campaign: x
        |output: y
        |analysis:
        |  a:
        |    extraction:
        |      report: {type: spikes}
        |      neuron_classes: {all: {}}
        |      windows:
        |        w: {bounds: [0, 1], trial_steps_label: t}
        |      trial_steps:
        |        t: {function: mean_first_spike, bounds: [0, 1], initial_offset: 3}
        |""".stripMargin)
    assert(intercept[IllegalArgumentException] {
      ConfigIO.loadAnalysis(s"$dir/forbidden.yaml")
    }.getMessage.contains("initial_offset"))
  }

  test("trial_steps_label: per-simulation dynamic offset shifts every trial") {
    val dir = Files.createTempDirectory("graft-tsd").toString
    val campaign = mkSims(dir)
    val cfg = SingleAnalysisConfig(
      name = "s", reportType = "spikes",
      windows = Map("w" -> WindowSpec(
        bounds = (0.0, 100.0), initialOffset = 10.0,
        trialStepsList = Seq(0.0, 200.0),
        trialStepsLabel = "align")),
      neuronClasses = Map("all" -> NeuronClassSpec()),
      features = Nil,
      trialSteps = Map("align" -> TrialStepsSpec(
        function = "mean_first_spike", bounds = (0.0, 1000.0))))
    val w = new Repository(spark, campaign, cfg, new ParquetAdapter).windows
      .select("simulation_id", "trial", "offset").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // step bases are initial_offset + list = [10, 210]; spikes are every 10
    // units from 100 (sim0) / 300 (sim1), so rebased first spikes:
    // sim0: step0 → 100-10=90, step1 → 210-210=0   → dyn = 45
    // sim1: step0 → 300-10=290, step1 → 300-210=90 → dyn = 190
    assert(w((0, 0)) === 10.0 + 45.0)
    assert(w((0, 1)) === 210.0 + 45.0)
    assert(w((1, 0)) === 10.0 + 190.0)
    assert(w((1, 1)) === 210.0 + 190.0)
  }

  test("dotted-path trial-steps function resolves by class name") {
    val dir = Files.createTempDirectory("graft-tsc").toString
    val campaign = mkSims(dir)
    val cfg = SingleAnalysisConfig(
      name = "s", reportType = "spikes",
      windows = Map("w" -> WindowSpec(
        bounds = (0.0, 10.0), trialStepsLabel = "c")),
      neuronClasses = Map("all" -> NeuronClassSpec()),
      features = Nil,
      trialSteps = Map("c" -> TrialStepsSpec(
        function = classOf[ConstantOffsetFn].getName, bounds = (0.0, 1000.0),
        params = Map("offset" -> 42.5))))
    val w = new Repository(spark, campaign, cfg, new ParquetAdapter).windows
      .select("offset").collect().map(_.getDouble(0)).distinct
    assert(w.toSeq === Seq(42.5))
  }
}

/** Custom TrialStepsFn used by the dotted-path resolution test. */
class ConstantOffsetFn extends TrialStepsFn {
  def compute(spark: SparkSession, spikes: DataFrame, spec: TrialStepsSpec): DataFrame = {
    import spark.implicits._
    val off = spec.params("offset").asInstanceOf[Number].doubleValue()
    spikes.select("simulation_id").distinct()
      .withColumn("dynamic_offset", lit(off))
  }
}
