package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** v13 cost study: what does MAINTAINING the IVF index save over
  * rebuilding it when a delta shard arrives?
  *
  * Measures, on one corpus (vec_id % 20 = 3 is the arriving 5% delta,
  * the v13 gate's split):
  *
  *   - `base build`  — centroid training + cell-partitioned write over
  *     the corpus minus the delta (the index that already exists when
  *     the delta arrives; paid once, amortized)
  *   - `insert`      — the v13 maintenance path: route the delta under
  *     the frozen coarse quantizer, append per-cell files, compact
  *     touched cells back to one file each
  *   - `rebuild`     — the alternative the maintenance path replaces:
  *     retrain centroids and rewrite every cell over corpus ∪ delta
  *
  * At 100 TB the gap is structural, not a constant: insert routes and
  * writes DELTA-sized data (plus a compaction bounded by touched
  * cells), rebuild re-shuffles and rewrites the CORPUS. The local
  * measurement pins the constant factors honestly at a scale where
  * rebuild is still feasible.
  *
  * Usage: runMain graft.tools.IvfMaintProfile <dir> [runs]
  */
object IvfMaintProfile {

  def main(args: Array[String]): Unit = {
    val dir = args.head
    val runs = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    // THE shipped build recipe — not a local copy, so a layout change in
    // Vectors keeps this profile honest automatically
    def writeIndex(of: DataFrame, out: String): Unit =
      graft.queries.Vectors.buildIvfIndex(of, out)
    def withNorm(df: DataFrame): DataFrame =
      df.withColumn("nrm", expr("sqrt(array_dot(embedding, embedding))"))
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val emb = graft.Tables.embeddings(spark, dir)
    val base = emb.filter(col("vec_id") % 20 =!= 3)
    val delta = emb.filter(col("vec_id") % 20 === 3)
    val (nBase, nDelta) = (base.count(), delta.count())

    (1 to runs).foreach { r =>
      val out = java.nio.file.Files.createTempDirectory("graft-ivfmaint").toString
      try {
        val buildSec = timed(writeIndex(base, out))
        // the exact shipped insert path (v13's routing form), phase-timed:
        // route+append is the per-batch cost; the compaction with
        // maxFiles=1 (the GATE's setting — every touched cell swaps every
        // run) is a full touched-cell rewrite, which a uniform delta makes
        // a full-corpus rewrite. Production compacts at a threshold of
        // dozens of files, amortizing that rewrite across as many inserts.
        var routed: DataFrame = null
        val routeSec = timed {
          val centArr = spark.read.parquet(s"$out/centroids")
          routed = graft.queries.Vectors.routeQueries(
            delta.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
            centArr, centArr.count())
            .select(col("q_id").as("vec_id"), col("cell"))
            .persist()
          routed.count()
          ()
        }
        val appendSec = timed {
          withNorm(delta).join(routed, "vec_id")
            .select(col("vec_id"), col("label"), col("embedding"),
              col("nrm"), col("cell"))
            .repartition(col("cell"))
            .write.partitionBy("cell").mode("append").parquet(s"$out/vectors")
        }
        routed.unpersist()
        val routeAppendSec = routeSec + appendSec
        val compactSec = timed {
          graft.queries.Vectors.compactCells(spark, s"$out/vectors", maxFiles = 1)
        }
        val out2 = java.nio.file.Files.createTempDirectory("graft-ivfmaint").toString
        val rebuildSec =
          try timed(writeIndex(emb, out2))
          finally graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(out2))
        println(f"[ivfmaint] run $r base=$nBase%,d delta=$nDelta%,d " +
          f"base build ${buildSec}%.1f s; route ${routeSec}%.1f s + " +
          f"append ${appendSec}%.1f s = ${routeAppendSec}%.1f s; " +
          f"compact(all cells) ${compactSec}%.1f s; rebuild ${rebuildSec}%.1f s " +
          f"(per-batch direct insert = ${routeAppendSec / rebuildSec * 100}%.0f%% of rebuild)")

        // THE BATCHED insert path (the shipped v13 shape): per arriving
        // batch the cost is route + ONE delta-sized staging append — no
        // per-cell files, so no ~15-20 ms × cells metadata floor. Ten
        // mini-batches pin per-batch cost ∝ batch bytes; the forced
        // flush (every staged cell over threshold → per-cell files) and
        // the production-threshold compaction are the amortized tail.
        val out3 = java.nio.file.Files.createTempDirectory("graft-ivfmaint").toString
        try {
          writeIndex(base, out3)
          val cent3 = spark.read.parquet(s"$out3/centroids")
          val nc3 = cent3.count()
          val routed3 = graft.queries.Vectors.routeQueries(
            delta.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
            cent3, nc3)
            .select(col("q_id").as("vec_id"), col("cell"))
          val rows3 = withNorm(delta).join(routed3, "vec_id")
            .select(col("vec_id"), col("label"), col("embedding"),
              col("nrm"), col("cell"))
            .persist()
          rows3.count()
          val nBatches = 10
          val stageSecs = (0 until nBatches).map { b =>
            timed(graft.queries.Vectors.stageInsert(
              spark, out3, rows3.filter(pmod(col("vec_id"), lit(nBatches)) === b)))
          }
          rows3.unpersist()
          val flushSec = timed {
            graft.queries.Vectors.flushStaging(spark, out3, blockBytes = 1L)
          }
          val compact3Sec = timed {
            graft.queries.Vectors.compactCells(spark, s"$out3/vectors",
              maxFiles = graft.queries.Vectors.CompactFileThreshold)
          }
          println(f"[ivfmaint] run $r BATCHED: stage/batch avg " +
            f"${stageSecs.sum / nBatches}%.2f s (min ${stageSecs.min}%.2f max " +
            f"${stageSecs.max}%.2f, ${nBatches} batches of ~${nDelta / nBatches}%,d); " +
            f"forced flush ${flushSec}%.1f s; compact(threshold=" +
            f"${graft.queries.Vectors.CompactFileThreshold}) ${compact3Sec}%.1f s; " +
            f"per-batch = ${stageSecs.sum / nBatches / rebuildSec * 100}%.1f%% of rebuild")
        } finally {
          graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(out3))
        }
      } finally {
        graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(out))
      }
    }
    spark.stop()
  }
}
