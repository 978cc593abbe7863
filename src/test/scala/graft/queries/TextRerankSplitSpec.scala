package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** STAGE LIVENESS of the t28b estimate/exact re-rank split (VERDICT r16
  * "missing" #2): output parity alone passes identically with the
  * estimate machinery dead (every pair exact-checked — the scratch-disk
  * blow-up the estimate exists to prevent) or with the exact path dead
  * (loser verdicts from the estimate — the correctness invariant).
  * This spec pins, on real corpora, that BOTH paths fire and that every
  * loser verdict is an exact-path verdict:
  *
  *  - borderline slice non-empty (the exact path has work) AND strictly
  *    smaller than the candidate set (the estimate cleared something);
  *  - every released loser pair sits inside the borderline slice and its
  *    final jaccard EQUALS the exact shingle-intersection jaccard — a
  *    mutation that routes all pairs to one path, flips the coalesce, or
  *    drops the exact join fails here.
  */
class TextRerankSplitSpec extends SparkSuite {

  private def assertSplitLive(
      dir: String, bands: Int, depth: Int, oracleKeys: Boolean): Unit = {
    val (est, borderline, scored) =
      Text.rerankAt(spark, dir, bands, depth, oracleKeys)
    val nCand = est.count()
    val nBorder = borderline.count()
    assert(nBorder > 0,
      s"exact path is DEAD at $dir ($bands x $depth): no borderline pairs")
    assert(nCand > nBorder,
      s"estimate path is DEAD at $dir ($bands x $depth): all $nCand " +
        "candidate pairs went to the exact slice")

    val losers = scored.filter(col("jaccard") >= 0.8).persist()
    try {
      assert(losers.count() > 0, s"no loser verdicts at $dir — nothing to pin")
      // every loser is a borderline pair (one-sided slice: jaccard >= 0.8
      // implies jhat >= 0.8 - eps OR an exact verdict raised it; either
      // way it must carry a jx row) ...
      assert(losers.join(borderline, Seq("doc1", "doc2"), "left_anti")
        .count() == 0,
        "a loser verdict escaped the borderline slice")
      // ... and its released jaccard IS the exact-path value
      val sh = Text.shinglesOf(graft.Tables.documents(spark, dir))
      val exact = Text.exactJaccard(sh, borderline)
      assert(exact.count() == borderline.distinct().count(),
        "exactJaccard stopped being total over the borderline slice")
      val drifted = losers
        .join(exact, Seq("doc1", "doc2"))
        .filter(col("jaccard") =!= col("jx"))
        .count()
      assert(drifted == 0,
        s"$drifted loser verdict(s) differ from the exact jaccard — " +
          "verdicts are leaking from the estimate path")
    } finally { losers.unpersist(); () }
  }

  test("both re-rank paths fire at the oracle-locked banding (sf0.001)") {
    assertSplitLive(sf0001, bands = 4, depth = 2, oracleKeys = true)
  }

  test("both re-rank paths fire on the xx-keyed scale path at GenScale x10") {
    val x10 = "/tmp/scale/x10"
    assume(new java.io.File(s"$x10/documents.parquet").exists(),
      "GenScale x10 fixture absent (tools/runtool.sh graft.tools.GenScale)")
    val (d, b) = Text.autoRowsXxForTesting(spark, x10)
    assertSplitLive(x10, bands = b, depth = d, oracleKeys = false)
  }
}
