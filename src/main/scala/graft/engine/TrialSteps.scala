package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable trial-steps functions (X2 — reference:
  * config/analysis_model.py:102-127 TrialStepsConfig +
  * extract/windows.py:78-111 `_calculate_dynamic_offset`): a window whose
  * `trial_steps_label` names a [[TrialStepsSpec]] gets a PER-SIMULATION
  * dynamic offset, computed by the spec's function from the spikes inside
  * the spec's bounds, added to every trial offset.
  *
  * Spark-first restatement of the reference contract: instead of a Python
  * callable over per-simulation numpy arrays, the function declares ONE
  * distributed plan over all simulations at once — input is the tagged
  * spike frame, output one row per simulation. The result is driver-scale
  * (#sims rows) and joined back broadcast.
  */
trait TrialStepsFn extends Serializable {

  /** `spikes`: (simulation_id: int, step: int, time: double) — the spikes
    * inside the spec's bounds for each of the window's step offsets, time
    * rebased so 0 is the step's own offset (reference rebases the same way,
    * extract/windows.py:58-75). Must return (simulation_id, dynamic_offset).
    */
  def compute(spark: SparkSession, spikes: DataFrame, spec: TrialStepsSpec): DataFrame
}

object TrialStepsFns {

  /** Registry: short names here, or any fully-qualified class name of a
    * [[TrialStepsFn]] (reflection — reference: utils.py:146-156
    * `import_by_string`).
    */
  def resolve(name: String): TrialStepsFn = builtin.getOrElse(name,
    Class.forName(name).getDeclaredConstructor().newInstance().asInstanceOf[TrialStepsFn])

  val builtin: Map[String, TrialStepsFn] = Map(
    "onset_from_spikes" -> OnsetFromSpikes,
    "mean_first_spike" -> MeanFirstSpike)
}

/** Histogram-threshold onset detection (the dynamic-offset analogue of the
  * reference's NSETM-2281 trial step — external/bnac/calculate_trial_step.py):
  * bin the bounded spikes (`n_bins`, default 100), take the first bin at or
  * after `baseline_bins` (default 25) whose count exceeds baseline mean +
  * 2σ(pop); the bin's start time is the per-simulation dynamic offset.
  */
object OnsetFromSpikes extends TrialStepsFn {
  def compute(spark: SparkSession, spikes: DataFrame, spec: TrialStepsSpec): DataFrame = {
    def intParam(k: String, d: Int) =
      spec.params.get(k).map(_.asInstanceOf[Number].intValue()).getOrElse(d)
    val nBins = intParam("n_bins", 100)
    val baselineBins = intParam("baseline_bins", 25)
    val binW = (spec.bounds._2 - spec.bounds._1) / nBins
    val hist = spikes
      .withColumn("bin", floor((col("time") - spec.bounds._1) / binW))
      .groupBy("simulation_id", "bin").agg(count(lit(1)).as("cnt"))
    val baseline = hist.filter(col("bin") < baselineBins)
      .groupBy("simulation_id")
      .agg(avg("cnt").as("mu"), stddev_pop("cnt").as("sd"))
    hist.join(baseline, "simulation_id")
      .filter(col("bin") >= baselineBins && col("cnt") > col("mu") + lit(2) * col("sd"))
      .groupBy("simulation_id")
      .agg((min("bin") * binW + spec.bounds._1).as("dynamic_offset"))
  }
}

/** Mean over step offsets of each step's first spike time — a simple
  * latency-alignment offset, exactly SQL-expressible (used by the oracle
  * gate as well as specs).
  */
object MeanFirstSpike extends TrialStepsFn {
  def compute(spark: SparkSession, spikes: DataFrame, spec: TrialStepsSpec): DataFrame =
    spikes.groupBy("simulation_id", "step").agg(min("time").as("fs"))
      .groupBy("simulation_id").agg(avg("fs").as("dynamic_offset"))
}
