package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Loop a hot subplan forever so a shell-side jstack can sample the
  * executor threads. Usage: runMain graft.tools.LoopDiag <sfDir>
  */
object LoopDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("GRAFT_DIAG_BYPASS")
      .foreach(v => b.config("spark.shuffle.sort.bypassMergeThreshold", v))
    sys.env.get("GRAFT_DIAG_LOCALDIR")
      .foreach(v => b.config("spark.local.dir", v))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries("t28_pipeline")(spark, sfDir).count()
    val (_, _, scored) =
      graft.queries.Text.rerankAt(spark, sfDir, 4, 2, true)
    val losers = scored.filter(col("jaccard") >= 0.8)
      .select(col("doc2").as("doc_id")).distinct()
    println("[loop-diag] PID=" + ProcessHandle.current().pid())
    var i = 0
    while (i < 200) {
      val t0 = System.nanoTime()
      losers.count()
      println(f"[loop-diag] iter $i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      i += 1
    }
    spark.stop()
  }
}
