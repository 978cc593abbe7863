package graft.queries

import graft.SparkSuite

/** v15 (residual IVF-PQ) beyond its DuckDB gate: the ISOLATION claim —
  * with routing held exact, residual codes order within a cell better
  * than raw-vector codes (the r18 finding: raw PQ spends its bytes on
  * the shared cell center; residual spends them on the variation in-cell
  * ranking needs). Measured at GenScale x10 (200-vector cells — the
  * shape where raw PQ's in-cell ties actually bite; sf0.01's 11-vector
  * cells are fully covered by the refine pool, so both forms tie there
  * and pin nothing).
  */
class ResidualPqSpec extends SparkSuite {

  test("residual codes out-rank raw codes in-cell at x10 (exact routing)") {
    val x10 = "/tmp/scale/x10"
    assume(new java.io.File(s"$x10/embeddings.parquet").exists(),
      "GenScale x10 fixture absent (tools/runtool.sh graft.tools.GenScale)")
    val ((rawAdc, rawRef), (resAdc, resRef)) =
      Vectors.measureResidualRecall(spark, x10, sample = 256)
    Seq(rawAdc, rawRef, resAdc, resRef).foreach(v =>
      assert(v >= 0.0 && v <= 1.0, s"recall out of range: $v"))
    // refine can only recover what its pool contains, in both forms
    assert(rawRef >= rawAdc && resRef >= resAdc)
    // the claim: same 8 bytes, strictly better in-cell ordering — the
    // x100 measurement put the gap at ~3× ADC / ~2× refine; pin a
    // conservative margin so fixture drift doesn't flake the suite
    assert(resAdc >= rawAdc + 0.05,
      f"residual ADC $resAdc%.3f did not beat raw $rawAdc%.3f by the margin")
    assert(resRef >= rawRef + 0.05,
      f"residual refine $resRef%.3f did not beat raw $rawRef%.3f by the margin")
  }

  test("sf0.01 sanity: tiny cells are pool-covered, so refine ties and bounds hold") {
    val ((rawAdc, rawRef), (resAdc, resRef)) =
      Vectors.measureResidualRecall(spark, sf001, sample = 64)
    Seq(rawAdc, rawRef, resAdc, resRef).foreach(v =>
      assert(v >= 0.0 && v <= 1.0, s"recall out of range: $v"))
    // ~11-vector cells sit entirely inside the 30-candidate pool: the
    // exact re-rank sees the whole cell either way, so refine measures
    // CELL MEMBERSHIP only and must agree across encodings
    assert(math.abs(rawRef - resRef) < 1e-9,
      s"pool-covered refine diverged: raw $rawRef vs residual $resRef")
  }
}
