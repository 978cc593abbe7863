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
  // keepers ≥6σ below the loser threshold — so pin it at a second,
  // 10× corpus too (the GenScale x10 fixture, where the r15 veto
  // episode showed gate-scale agreement can mask scale divergence)
  test("t28b equals t28 at GenScale x10") {
    val x10 = "/tmp/scale/x10"
    assume(new java.io.File(s"$x10/documents.parquet").exists(),
      "GenScale x10 fixture absent (tools/runtool.sh graft.tools.GenScale)")
    parityAt(x10)
  }

  // the SCALE path the env knob actually dispatches (xxhash64 band keys
  // at the xx-measured banding) against the oracle-locked release: a
  // different hash family catches a different CHANCE candidate set, but
  // every true loser must survive any banding the recall target admits
  // (bandsForRecall per-pair miss ≤ 1e-6) and every chance pair must be
  // cleared by the re-rank — so the RELEASED rows must match exactly.
  private def xxParityAt(dir: String): Unit = {
    val locked = graft.SparkEntry.queries("t28_pipeline")(spark, dir)
      .collect().map(_.toSeq).toSet
    val (d, b) = Text.autoRowsXxForTesting(spark, dir)
    val scaled = Text.t28bForTesting(spark, dir, b, d, oracleKeys = false)
      .collect().map(_.toSeq).toSet
    assert(locked.nonEmpty, "pipeline returned no rows")
    assert(scaled === locked,
      s"xx scale path diverged at $dir ($b x $d): " +
        s"scaled-only=${(scaled -- locked).take(3)}, " +
        s"locked-only=${(locked -- scaled).take(3)}")
  }

  test("xx-keyed t28b at the measured banding equals t28 (sf0.001)") {
    xxParityAt(sf0001)
  }

  test("xx-keyed t28b at the measured banding equals t28 at GenScale x10") {
    val x10 = "/tmp/scale/x10"
    assume(new java.io.File(s"$x10/documents.parquet").exists(),
      "GenScale x10 fixture absent (tools/runtool.sh graft.tools.GenScale)")
    xxParityAt(x10)
  }
}
