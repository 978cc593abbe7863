package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall-policy profile: build the IVF index for a corpus the shipped
  * way ([[graft.queries.Vectors.buildIvfIndex]], which now persists the
  * measured recall-vs-nprobe curve for hierarchically-routed indexes),
  * print the curve, and print the nprobe the serving policy picks at a
  * few recall targets — the BASELINE.md "chosen nprobe per corpus" row.
  *
  * Usage: runMain graft.tools.NprobeProfile [dir] [target...]
  * (defaults: /tmp/scale/x100, targets 0.8 0.9 0.95)
  */
object NprobeProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale/x100")
    val targets =
      if (args.length > 1) args.drop(1).map(_.toDouble).toSeq
      else Seq(0.8, 0.9, 0.95)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft-nprobe-idx").toString
    val t0 = System.nanoTime()
    graft.queries.Vectors.buildIvfIndex(emb, out)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val nCells = spark.read.parquet(s"$out/centroids").count()
    println(f"[nprobe] dir=$dir cells=$nCells build=$buildSec%.1f s (index + curve)")
    // GRAFT_NPROBE_THRESHOLD forces curve measurement below the
    // production routing threshold (study knob: an x100-sized corpus
    // serves flat in production — exact routing — but the forced
    // hierarchy still measures its ADC/refine loss per probe depth)
    sys.env.get("GRAFT_NPROBE_THRESHOLD").map(_.toLong).foreach { th =>
      val t1 = System.nanoTime()
      graft.queries.Vectors.writeRecallCurve(emb, out, threshold = th)
      println(f"[nprobe] forced-threshold($th) curve: ${(System.nanoTime() - t1) / 1e9}%.1f s")
    }
    val curvePath = new java.io.File(s"$out/recall_curve")
    if (!curvePath.exists()) {
      println(s"[nprobe] cells=$nCells <= threshold: flat routing is exact, no curve")
    } else {
      val pts = graft.queries.Vectors.loadCurve(spark, out).get
      val curve = pts.map(p => (p.nprobe, p.routing))
      println(s"[nprobe] routing curve: " +
        curve.map { case (np, r) => f"$np->$r%.3f" }.mkString(" "))
      if (pts.exists(_.hasE2e)) {
        println(s"[nprobe] e2e ADC curve:    " + pts.map(p =>
          f"${p.nprobe}->${p.adc}%.3f").mkString(" "))
        println(s"[nprobe] e2e refine curve: " + pts.map(p =>
          f"${p.nprobe}->${p.refine}%.3f").mkString(" "))
        if (!pts.head.adcMulti.isNaN) {
          println(s"[nprobe] MULTI-cell ADC:    " + pts.map(p =>
            f"${p.nprobe}->${p.adcMulti}%.3f").mkString(" "))
          println(s"[nprobe] MULTI-cell refine: " + pts.map(p =>
            f"${p.nprobe}->${p.refineMulti}%.3f").mkString(" "))
        }
      }
      for (t <- targets) {
        val e2ePick =
          if (pts.exists(_.hasE2e))
            s" | e2e(ADC)-> nprobe=${graft.queries.Vectors.pickNprobe(
              pts.filter(_.hasE2e).map(p => (p.nprobe, p.adc)), t)}"
          else ""
        println(f"[nprobe] target=$t%.2f -> routing nprobe=${
          graft.queries.Vectors.pickNprobe(curve, t)}$e2ePick")
      }
      println(s"[nprobe] policy default (0.9): nprobe=" +
        graft.queries.Vectors.nprobeForRecall(spark, out))
    }
    graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(out))
    spark.stop()
  }
}
