package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The END-TO-END recall curve + policy (VERDICT r17 missing #2 / next
  * #2): the persisted curve now also measures recall@k of the composed
  * route×ADC serving path and of route×ADC×refine against exact cosine
  * truth, `GRAFT_IVF_RECALL_E2E` targets the ADC column, and the curve
  * is memoized per (session, index) so the serving path stops re-reading
  * a parquet per plan construction (VERDICT r17 wrong #2 / ADVICE).
  */
class E2eRecallCurveSpec extends SparkSuite {

  private def freshIndex(nVec: Int, nCells: Int): (String, org.apache.spark.sql.DataFrame) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-e2e-idx").toString
    val emb = RoutingFixtures.vectors(spark, nVec, nCells)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Vectors.buildIvfIndex(emb, dir)
    Vectors.writeRecallCurve(emb, dir, threshold = 16)
    (dir, emb)
  }

  test("curve persists e2e columns for BOTH encodings; refine never loses to ADC; terminal routing is exact") {
    val (dir, emb) = freshIndex(nVec = 2048, nCells = 64)
    try {
      val df = spark.read.parquet(s"$dir/recall_curve").orderBy("nprobe")
      val rows = df.collect()
      assert(rows.nonEmpty)
      assert(df.columns.toSeq == Seq("nprobe", "recall",
        "recall_adc", "recall_refine",
        "recall_adc_multi", "recall_refine_multi",
        "recall_adc_resid", "recall_refine_resid",
        "recall_adc_resid_multi", "recall_refine_resid_multi",
        "encodings"), s"curve schema drifted: ${df.columns.toSeq}")
      // the curve records which encodings it measured
      assert(rows.forall(_.getString(10) == "raw,residual"),
        "encodings column did not record the measured tiers")
      val pts = rows.map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7), r.getDouble(8), r.getDouble(9)))
      pts.foreach { case (np, routing, adc, ref, adcM, refM, adcR, refR,
          adcRM, refRM) =>
        Seq("routing" -> routing, "adc" -> adc, "refine" -> ref,
          "adc_multi" -> adcM, "refine_multi" -> refM,
          "adc_resid" -> adcR, "refine_resid" -> refR,
          "adc_resid_multi" -> adcRM, "refine_resid_multi" -> refRM)
          .foreach { case (n, v) =>
            assert(v >= 0.0 && v <= 1.0, s"$n out of range at nprobe $np: $v")
          }
        // structural WITHIN a candidate set: refine picks the exact-best
        // k of a pool ⊇ ADC's top-k, and every true neighbor in the pool
        // outranks every non-neighbor under the exact score
        assert(ref >= adc, s"refine recall $ref < ADC recall $adc at nprobe $np")
        assert(refM >= adcM, s"multi refine $refM < multi ADC $adcM at nprobe $np")
        assert(refR >= adcR, s"resid refine $refR < resid ADC $adcR at nprobe $np")
        assert(refRM >= adcRM,
          s"resid multi refine $refRM < resid multi ADC $adcRM at nprobe $np")
      }
      // the terminal point probes every super: routing is exact there,
      // so its e2e gap is PURE quantization/cell-membership loss
      assert(pts.last._2 == 1.0, s"terminal routing recall != 1.0: ${pts.last}")
      // on the clustered fixture the composed path must actually work:
      // a collapsed codebook or broken cell pruning reads as ~0 here
      assert(pts.last._4 >= 0.5,
        s"terminal refine recall ${pts.last._4} — composed path degenerate")
      // the multi-cell scan exists to lift the single-cell ceiling: on
      // this fixture the deepest multi refine must do at least as well
      // as the deepest single-cell refine (its candidate set contains
      // the flat-argmax cell the single path scans at terminal depth)
      assert(pts.last._6 >= pts.last._4 - 1e-9,
        s"terminal multi refine ${pts.last._6} < single ${pts.last._4}")
      // the r18 finding, now priced by the curve itself: at exact
      // (terminal) routing, residual ADC must not lose to raw ADC on
      // clustered geometry — the 8 bytes move from the shared cell
      // center to the within-cell variation ranking needs
      assert(pts.last._7 >= pts.last._3 - 1e-9,
        s"terminal resid ADC ${pts.last._7} < raw ADC ${pts.last._3}")
      // single vs multi at SHALLOW depths is deliberately not asserted:
      // fixed-k selection from a bigger haystack is not structurally
      // monotone — that non-monotonicity is why the curve measures both.
    } finally {
      emb.unpersist()
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(dir))
    }
  }

  test("GenScale x10: the persisted curve prices the residual tier above raw ADC") {
    val x10 = "/tmp/scale/x10"
    assume(new java.io.File(s"$x10/embeddings.parquet").exists(),
      "GenScale x10 fixture absent (tools/runtool.sh graft.tools.GenScale)")
    val dir = java.nio.file.Files.createTempDirectory("graft-e2e-x10").toString
    // small held-out sample bounds the suite's cost; stderr ~0.04 is
    // fine for a ≥-with-margin pin
    System.setProperty("graft.ivf.recall.sample", "128")
    try {
      val emb = graft.Tables.embeddings(spark, x10)
      Vectors.buildIvfIndex(emb, dir)
      Vectors.writeRecallCurve(emb, dir, threshold = 16)
      val last = spark.read.parquet(s"$dir/recall_curve")
        .orderBy(col("nprobe").desc).limit(1).collect().head
      val (adcRaw, adcResid) = (last.getDouble(2), last.getDouble(6))
      // ResidualPqSpec pins the isolation margin at x10 (~3×); the curve
      // must now carry that same signal — resid beats raw by a real
      // margin at terminal (exact) routing on GenScale geometry
      assert(adcResid >= adcRaw + 0.05,
        f"x10 curve: resid ADC $adcResid%.3f did not beat raw $adcRaw%.3f")
    } finally {
      System.clearProperty("graft.ivf.recall.sample")
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(dir))
    }
  }

  test("GRAFT_IVF_RECALL_E2E targets the residual column by default; TIER=raw pins raw") {
    val (dir, emb) = freshIndex(nVec = 1024, nCells = 64)
    try {
      val pts = Vectors.loadCurve(spark, dir).get
      assert(pts.exists(_.hasResid), "curve lost its residual columns")
      val t = 0.5
      System.setProperty("graft.ivf.recall.e2e", t.toString)
      try {
        val expectResid = Vectors.pickNprobe(
          pts.filter(_.hasResid).map(p => (p.nprobe, p.residAdc)), t)
        assert(Vectors.nprobeForRecall(spark, dir) == expectResid,
          "default e2e target did not price the residual tier")
        System.setProperty("graft.ivf.recall.tier", "raw")
        try {
          val expectRaw = Vectors.pickNprobe(
            pts.filter(_.hasE2e).map(p => (p.nprobe, p.adc)), t)
          assert(Vectors.nprobeForRecall(spark, dir) == expectRaw,
            "TIER=raw did not price the raw column")
        } finally System.clearProperty("graft.ivf.recall.tier")
      } finally System.clearProperty("graft.ivf.recall.e2e")
    } finally {
      emb.unpersist()
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(dir))
    }
  }

  test("GRAFT_IVF_RECALL_E2E targets the measured ADC tier; default stays routing") {
    val (dir, emb) = freshIndex(nVec = 1024, nCells = 64)
    try {
      val pts = Vectors.loadCurve(spark, dir).get
      val routingPick = Vectors.pickNprobe(
        pts.map(p => (p.nprobe, p.routing)), Vectors.RecallTargetDefault)
      assert(Vectors.nprobeForRecall(spark, dir) == routingPick)
      // target the measured raw-ADC column just under its terminal value
      // so the pick is well-defined on any fixture draw (TIER=raw: the
      // tier default is residual, spec'd separately)
      val t = pts.last.adc - 1e-9
      System.setProperty("graft.ivf.recall.e2e", t.toString)
      System.setProperty("graft.ivf.recall.tier", "raw")
      try {
        val expected = Vectors.pickNprobe(pts.map(p => (p.nprobe, p.adc)), t)
        assert(Vectors.nprobeForRecall(spark, dir) == expected,
          s"e2e target $t: expected nprobe $expected")
      } finally {
        System.clearProperty("graft.ivf.recall.e2e")
        System.clearProperty("graft.ivf.recall.tier")
      }
    } finally {
      emb.unpersist()
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(dir))
    }
  }

  test("an e2e target against a routing-only curve falls back to routing, loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-e2e-legacy").toString
    try {
      import spark.implicits._
      // a pre-r18 curve: (nprobe, recall) only
      Seq((1, 0.4), (2, 0.7), (4, 0.95), (8, 1.0)).toDF("nprobe", "recall")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/recall_curve")
      System.setProperty("graft.ivf.recall.e2e", "0.9")
      try assert(Vectors.nprobeForRecall(spark, dir) == 4,
        "legacy-curve fallback should pick by the routing column at the default target")
      finally System.clearProperty("graft.ivf.recall.e2e")
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(dir))
    }
  }

  test("the curve is read from disk once per (session, index)") {
    val (dir, emb) = freshIndex(nVec = 1024, nCells = 64)
    try {
      Vectors.loadCurve(spark, dir) // first read may or may not be cached already
      val before = Vectors.curveReads.get()
      (1 to 5).foreach(_ => Vectors.nprobeForRecall(spark, dir))
      Vectors.loadCurve(spark, dir)
      assert(Vectors.curveReads.get() == before,
        "repeated policy lookups re-read the persisted curve")
    } finally {
      emb.unpersist()
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(dir))
    }
  }

  test("an empty query sample measures no curve instead of persisting NaNs") {
    val nCells = 64
    val c = RoutingFixtures.centroids(spark, nCells)
    val q = RoutingFixtures.queries(spark, 4, nCells).filter(col("q_id") < 0)
    val curve = Vectors.measureRoutingRecall(q, c, nCells)
    assert(curve.isEmpty, s"empty sample produced a curve: $curve")
  }
}
