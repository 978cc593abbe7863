package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured point for BASELINE.md: the co-located (bucketed) report⋈dim
  * join vs the same join over plain parquet, both forced down the
  * shuffled-join path (merge hint — the 100 TB case where neither side
  * broadcasts). Reports the one-time clustered-write cost and the
  * per-join read-path cost, so the break-even join count is explicit.
  *
  * Usage: runMain graft.tools.BucketProbe <sfDir> [iters]
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val iters = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id").as("gid"), col("event_id"), col("value"))
    val dim = ev.select("gid").distinct().filter(col("gid") % 2 === 0)
      .withColumn("klass", col("gid") % 7)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def agg(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      l.hint("merge").join(r.hint("merge"), "gid")
        .groupBy("klass").agg(count(lit(1)).as("n"), sum("value").as("s"))

    // plain parquet side (what every query pays without clustering)
    val dimPath = java.nio.file.Files.createTempDirectory("graft-bprobe-dim").toString
    dim.write.mode("overwrite").parquet(dimPath)
    val dimP = spark.read.parquet(dimPath)

    val base = java.nio.file.Files.createTempDirectory("graft-bprobe").toString
    val (_, wSpikes) = time {
      graft.sources.Bucketed.write(ev, "bp_spikes", s"$base/spikes", 32, Seq("gid"))
    }
    val (_, wDim) = time {
      graft.sources.Bucketed.write(dim, "bp_dim", s"$base/dim", 32, Seq("gid"))
    }
    println(f"[bprobe] clustered write: spikes=$wSpikes%.2fs dim=$wDim%.2fs")

    val sb = graft.sources.Bucketed.table(spark, "bp_spikes")
    val db = graft.sources.Bucketed.table(spark, "bp_dim")
    require(!graft.sources.Bucketed.hasShuffle(sb.hint("merge").join(db.hint("merge"), "gid")),
      "bucketed probe join unexpectedly shuffled")

    for (i <- 1 to iters) {
      val (np, tp) = time(agg(ev, dimP).count())
      val (nb, tb) = time(agg(sb, db).count())
      require(np == nb, s"row mismatch plain=$np bucketed=$nb")
      println(f"[bprobe] run$i plain=$tp%.3fs bucketed=$tb%.3fs groups=$np")
    }
    spark.stop()
  }
}
