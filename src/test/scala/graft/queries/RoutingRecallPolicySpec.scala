package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The recall-targeted nprobe policy (VERDICT r16 "missing" #4 / "next
  * round" #2): the index build persists its measured recall-vs-nprobe
  * curve, and the serving tier picks the smallest nprobe meeting a
  * recall target instead of a constant that decays as cells grow.
  */
class RoutingRecallPolicySpec extends SparkSuite {

  test("measured curve is monotone and terminates exactly at 1.0") {
    val nCells = 4096
    val c = RoutingFixtures.centroids(spark, nCells).persist()
    val q = RoutingFixtures.queries(spark, 400, nCells).persist()
    try {
      val curve = Vectors.measureRoutingRecall(q, c, nCells)
      assert(curve.nonEmpty)
      val probes = curve.map(_._1)
      assert(probes == probes.sorted, s"probe depths out of order: $probes")
      val recalls = curve.map(_._2)
      // monotone up to sampling exactness: a deeper probe set is a
      // SUPERSET of a shallower one, so agreement cannot drop
      assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a },
        s"recall not monotone in nprobe: $curve")
      // the terminal point probes every super — flat argmax by identity
      assert(recalls.last == 1.0, s"terminal recall != 1.0: $curve")
      assert(recalls.head < 1.0,
        "nprobe=1 already exact on the fixture — the curve pins nothing")
    } finally { c.unpersist(); q.unpersist(); () }
  }

  test("pickNprobe selects the smallest measured depth meeting the target") {
    val curve = Seq((1, 0.45), (2, 0.64), (4, 0.85), (8, 0.97), (16, 1.0))
    assert(Vectors.pickNprobe(curve, 0.9) == 8)
    assert(Vectors.pickNprobe(curve, 0.64) == 2)
    assert(Vectors.pickNprobe(curve, 0.5) == 2)
    assert(Vectors.pickNprobe(curve, 1.0) == 16)
    // unmeetable target: serve at the deepest measured point, loudly
    assert(Vectors.pickNprobe(curve.init, 1.0) == 8)
  }

  test("build persists the curve above the threshold; nprobeForRecall reads it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-recall-idx").toString
    try {
      // a 128-cell index (labels = synthetic cells) with the threshold
      // overridden BELOW it, so the spec exercises the hierarchical
      // build path without a >1024-cell fixture
      val nCells = 128
      val emb = RoutingFixtures.centroids(spark, nCells)
        .select(col("cell").cast("long").as("vec_id"),
          col("cell").as("label"), col("centroid").as("embedding"))
      Vectors.buildIvfIndex(emb, dir)
      // at the production threshold (1024 > 128) no curve is written
      assert(!new java.io.File(s"$dir/recall_curve").exists(),
        "curve written for a flat-routed index — pure build overhead")
      Vectors.writeRecallCurve(emb, dir, threshold = 16)
      assert(new java.io.File(s"$dir/recall_curve").exists())
      val curve = spark.read.parquet(s"$dir/recall_curve")
        .orderBy("nprobe").collect()
        .map(r => (r.getInt(0), r.getDouble(1))).toSeq
      assert(curve.nonEmpty && curve.last._2 == 1.0, s"bad persisted curve: $curve")
      val picked = Vectors.nprobeForRecall(spark, dir)
      assert(picked == Vectors.pickNprobe(curve, Vectors.RecallTargetDefault),
        s"policy picked $picked, curve says " +
          s"${Vectors.pickNprobe(curve, Vectors.RecallTargetDefault)}")
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(dir))
    }
  }

  test("an index without a curve serves at the historical default") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nocurve-idx").toString
    try assert(Vectors.nprobeForRecall(spark, dir) == 2)
    finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(dir))
    }
  }
}
