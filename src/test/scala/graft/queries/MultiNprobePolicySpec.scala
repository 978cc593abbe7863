package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Recall-targeted nprobe for the MULTI-cell residual path (VERDICT r19
  * next #5): `GRAFT_IVF_RECALL_E2E` now picks breadth from the curve's
  * `recall_*_multi` columns for v14/v16/s14 serving. GenScale's
  * geometry keeps those columns flat (exact top-k is ~100%
  * in-argmax-cell there), so the spec builds a BOUNDARY-HEAVY fixture —
  * same-region cells nearly overlapping, within-cell noise comparable
  * to the cell separation — where exact neighbors straddle cells and
  * breadth is the knob that actually buys recall.
  */
class MultiNprobePolicySpec extends SparkSuite {

  /** Boundary-straddling corpus: the cell term (0.1) is WEAK against
    * the noise term (0.3), so a vector's exact neighbors spread across
    * its region's cells; labels still define the IVF cells. Same
    * deterministic hash-derivation idiom as RoutingFixtures.
    */
  private def boundaryVectors(nVec: Int, nCells: Int) = {
    val nRegions = math.ceil(math.sqrt(nCells.toDouble)).toInt
    val dims = RoutingFixtures.dims
    spark.range(nVec)
      .withColumn("home", pmod(abs(hash(col("id") * 7)), lit(nCells)))
      .withColumn("region", pmod(abs(hash(col("home") * 31)), lit(nRegions)))
      .select(
        col("id").as("vec_id"),
        col("home").cast("int").as("label"),
        expr(s"""transform(sequence(0, ${dims - 1}),
                  d -> cast(hash(region * 64 + d) / 2.147483647E9 * 0.8
                          + hash(home * 64 + d) / 2.147483647E9 * 0.1
                          + hash(id * 64 + d) / 2.147483647E9 * 0.3 as double))""")
          .as("embedding"))
  }

  private def freshBoundaryIndex(): (String, org.apache.spark.sql.DataFrame) = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-multinp-idx").toString
    val emb = boundaryVectors(2048, 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Vectors.buildIvfIndex(emb, dir)
    Vectors.writeRecallCurve(emb, dir, threshold = 16)
    (dir, emb)
  }

  test("multi columns rise with nprobe on boundary geometry; the policy reads them") {
    val (dir, emb) = freshBoundaryIndex()
    try {
      val rows = spark.read.parquet(s"$dir/recall_curve")
        .orderBy("nprobe").collect()
        .map(r => (r.getInt(0), r.getDouble(
          r.schema.fieldIndex("recall_adc_resid_multi"))))
      // the fixture's whole point: breadth must BUY recall here
      // (non-vacuous — on GenScale this delta is ~0)
      assert(rows.last._2 > rows.head._2 + 0.02,
        s"multi-cell residual recall flat on the boundary fixture: $rows")
      // target midway between the shallowest and deepest measured
      // points: the policy must probe deeper than 1 to meet it
      val target = (rows.head._2 + rows.last._2) / 2
      sys.props.put("graft.ivf.recall.e2e", target.toString)
      try {
        val picked = Vectors.nprobeForRecall(spark, dir, multi = true)
        assert(picked == Vectors.pickNprobe(rows.toSeq, target),
          s"multi policy picked $picked, column says " +
            s"${Vectors.pickNprobe(rows.toSeq, target)}")
        assert(picked > rows.head._1,
          s"policy picked the shallowest depth $picked despite a target " +
            s"$target the shallow multi recall ${rows.head._2} misses")
        // the serving wiring agrees, and an explicit override wins
        assert(Vectors.multiNprobe(spark, dir) == picked)
        sys.props.put("graft.ivf.nprobe", "7")
        try assert(Vectors.multiNprobe(spark, dir) == 7)
        finally { sys.props.remove("graft.ivf.nprobe"); () }
      } finally { sys.props.remove("graft.ivf.recall.e2e"); () }
      // no target set: the historical oracle-pinned default
      assert(Vectors.multiNprobe(spark, dir) == 2,
        "without a target the multi breadth must stay at the gates' 2")
    } finally {
      emb.unpersist()
      Vectors.clearIndexCache(spark)
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(dir))
    }
  }

  test("s14's streaming serving shape at the auto-picked breadth == the v16 batch recompute") {
    val (dir, emb) = freshBoundaryIndex()
    try {
      val (cent, _, codes, cb, cbRows) = Vectors.residualPqOpen(spark, dir)
      val cents = cent.orderBy("cell").collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
      val q = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        .persist()
      sys.props.put("graft.ivf.recall.e2e", "0.8")
      try {
        val k = Vectors.multiNprobe(spark, dir)
        assert(k > 1, s"auto policy picked $k — parity check vacuous")
        // streaming form: one per-row broadcast-state expression
        val probe = Vectors.rowRouteCellsResidualProbe(
          q, Vectors.flatRouterState(cents), cbRows, superProbe = 1, k = k)
        val got = codes.join(broadcast(probe), Seq("cell"))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"), Vectors.adcLookup.as("adist"))
        // batch form: v16's multiRoute + per-(q, cell) residual tables
        val route = Vectors.multiRoute(q, cent, nprobe = k)
        val dtab = Vectors.residualMultiDtab(q, cent, route, cb)
        val want = codes.join(broadcast(route), "cell")
          .join(broadcast(dtab), Seq("q_id", "cell"))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"), Vectors.adcLookup.as("adist"))
        assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
          "streaming multi-cell serving diverges from the batch form " +
            s"at auto breadth $k")
      } finally { sys.props.remove("graft.ivf.recall.e2e"); () }
      q.unpersist()
    } finally {
      emb.unpersist()
      Vectors.clearIndexCache(spark)
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(dir))
    }
  }
}
