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

  private def parityAt(dir: String): Unit = {
    def rows(name: String) =
      graft.SparkEntry.queries(name)(spark, dir)
        .collect().map(_.toSeq).toSet
    val locked = rows("t28_pipeline")
    val scaled = rows("t28b_pipeline_scaled")
    assert(locked.nonEmpty, "pipeline returned no rows at gate scale")
    assert(scaled === locked,
      s"scale path diverged: scaled-only=${(scaled -- locked).take(3)}, " +
        s"locked-only=${(locked -- scaled).take(3)}")
  }

  test("t28b at the oracle-locked banding equals t28 exactly") {
    parityAt(sf0001)
  }

  // the r16 re-rank (signature-estimated jaccard + bounded exact slice)
  // makes parity a STATISTICAL claim — the estimate alone only clears
  // keepers ≥3.5σ below the loser threshold — so pin it at a second,
  // 10× corpus too (the GenScale x10 fixture, where the r15 veto
  // episode showed gate-scale agreement can mask scale divergence)
  test("t28b equals t28 at GenScale x10") {
    val x10 = "/tmp/scale/x10"
    assume(new java.io.File(s"$x10/documents.parquet").exists(),
      "GenScale x10 fixture absent (tools/runtool.sh graft.tools.GenScale)")
    parityAt(x10)
  }
}
