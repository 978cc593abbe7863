package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Where do v13's append seconds go? The x100 IvfMaintProfile measured a
  * ~11 s floor for appending a 10k-row delta into 600 `cell=` partition
  * dirs — 2-3× the full-corpus rebuild — which is metadata, not data.
  * This probe separates the candidate costs by timing a LABEL-assigned
  * delta (cell = label directly — the routing step is deliberately
  * skipped; IvfMaintProfile times the shipped route phase separately,
  * and the file-layout cost under test here only depends on how many
  * cell dirs receive rows) through:
  *
  *   1. `noop` sink            — upstream plan only (join + shuffle)
  *   2. partitionBy → FRESH dir — dynamic-partition write + commit,
  *                                no pre-existing partitions
  *   3. partitionBy → append    — the shipped path: + existing-dir
  *                                listing and per-dir merge commit
  *   4. single-dir append       — no partitionBy (one file), isolating
  *                                the per-partition-dir commit cost
  *
  * Usage: runMain graft.tools.AppendProbe <dir> [runs]
  */
object AppendProbe {

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

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val emb = graft.Tables.embeddings(spark, dir)
    val base = emb.filter(col("vec_id") % 20 =!= 3)
    val delta = emb.filter(col("vec_id") % 20 === 3)
      .withColumn("nrm", expr("sqrt(array_dot(embedding, embedding))"))
      .withColumn("cell", col("label"))
      .select("vec_id", "label", "embedding", "nrm", "cell")
      .persist()
    delta.count()

    val out = java.nio.file.Files.createTempDirectory("graft-appendprobe").toString
    try {
      (1 to runs).foreach { r =>
        // REBUILT per run: appending into a target that already holds
        // run r-1's files would conflate the per-file floor under test
        // with directory growth across runs
        base.withColumn("nrm", expr("sqrt(array_dot(embedding, embedding))"))
          .withColumn("cell", col("label"))
          .repartition(col("cell"))
          .write.partitionBy("cell").mode("overwrite").parquet(s"$out/vectors")
        val noop = timed {
          delta.repartition(col("cell")).write.mode("overwrite").format("noop").save()
        }
        val fresh = timed {
          delta.repartition(col("cell"))
            .write.partitionBy("cell").mode("overwrite").parquet(s"$out/fresh_$r")
        }
        val append = timed {
          delta.repartition(col("cell"))
            .write.partitionBy("cell").mode("append").parquet(s"$out/vectors")
        }
        val single = timed {
          delta.repartition(col("cell"))
            .write.mode("append").parquet(s"$out/single_$r")
        }
        println(f"[append] run $r upstream(noop) ${noop}%.1f s; " +
          f"fresh-dir partitioned ${fresh}%.1f s; append-to-600-dirs ${append}%.1f s; " +
          f"single-dir append ${single}%.1f s")
      }
    } finally {
      delta.unpersist()
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(out))
    }
    spark.stop()
  }
}
