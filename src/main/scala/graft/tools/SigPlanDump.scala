package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dump the v9 signature frame's formatted physical plan at an explicit
  * or the measured-auto banding — the v9 gate itself returns a local
  * one-row frame (LocalTableScan), so gate-level PlanDump carries no
  * evidence about the signature derivation this tool explains. Also
  * prints the plan's size in nodes/chars: the r21 change replaces
  * bands·depth·dims literal plane coefficients with one broadcast-state
  * expression, and plan size IS the measured quantity (v9's warm cost was
  * driver planning over those literals).
  *
  * Usage: runMain graft.tools.SigPlanDump <dir> (<bands> <depth> | auto)
  */
object SigPlanDump {

  def main(args: Array[String]): Unit = {
    val dir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, dir)
    val (bands, depth) = args.tail.toSeq match {
      case Seq("auto") =>
        // the v9 gate's measured walk (autoPlanesFor), replicated with the
        // same building blocks so the dumped banding is the gate's
        var d = graft.queries.Vectors.autoPlanesPerBand(
          emb, emb.count(), graft.queries.Lsh.DefaultTargetOccupancy,
          bands = 4, sample = 1.0)
        var b = graft.queries.Vectors.autoBandsFor(d)
        def maxBucket(dd: Int, bb: Int): Long =
          graft.queries.Vectors.lshSignatures(emb, bands = bb, planesPerBand = dd)
            .groupBy("band", "bkey").agg(count(lit(1)).as("c"))
            .agg(max("c")).head().getLong(0)
        var best = maxBucket(d, b)
        var (bestD, bestB) = (d, b)
        var stale = 0
        while (d < 24 && best > graft.queries.Lsh.DefaultBucketCap && stale < 2) {
          d += 1
          b = graft.queries.Vectors.autoBandsFor(d)
          val m = maxBucket(d, b)
          if (m < (best * 9) / 10) stale = 0 else stale += 1
          if (m < best) { best = m; bestD = d; bestB = b }
        }
        (bestB, bestD)
      case Seq(b, d) => (b.toInt, d.toInt)
      case _ => sys.error("usage: SigPlanDump <dir> (<bands> <depth> | auto)")
    }
    println(s"==== lshSignatures banding: $bands bands x $depth planes ====")
    val sig = graft.queries.Vectors.lshSignatures(emb, bands, depth)
    val qe = sig.queryExecution
    val plan = qe.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    println(plan)
    println(s"==== plan size: ${plan.length} chars, " +
      s"${qe.optimizedPlan.map(_ => 1).sum} optimized nodes, " +
      s"${qe.optimizedPlan.flatMap(_.expressions).map(e => e.collect { case x => x }.size).sum} expression nodes ====")
    spark.stop()
  }
}
