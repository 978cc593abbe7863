package graft.queries

import graft.SparkSuite

/** t28b (the scale-path composed pipeline: per-row signature candidates
  * at a configurable banding) must equal t28 (the oracle-locked
  * aggregate-form 4×2) row-for-row at the default banding — the parity
  * that licenses t28b sharing t28's DuckDB oracle. A divergence here
  * means the per-row candidate derivation drifted from the aggregate
  * form (or the release stages stopped being shared code).
  */
class PipelineScaledParitySpec extends SparkSuite {

  test("t28b at the oracle-locked banding equals t28 exactly") {
    def rows(name: String) =
      graft.SparkEntry.queries(name)(spark, sf0001)
        .collect().map(_.toSeq).toSet
    val locked = rows("t28_pipeline")
    val scaled = rows("t28b_pipeline_scaled")
    assert(locked.nonEmpty, "pipeline returned no rows at gate scale")
    assert(scaled === locked,
      s"scale path diverged: scaled-only=${(scaled -- locked).take(3)}, " +
        s"locked-only=${(locked -- scaled).take(3)}")
  }
}
