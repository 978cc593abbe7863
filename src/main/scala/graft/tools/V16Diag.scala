package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage attribution for v16: time the route, the per-(q, cell) residual
  * dtab, and the full gate separately, warm.
  *
  * NOTE (ADVICE r20): the route/dtab pieces timed here are v16Pieces'
  * PRE-r20 derivation (multiRoute + residualMultiDtab) — kept
  * deliberately as the comparison baseline for the broadcast-state
  * probe the production gate now runs; "v16 full" is the only line that
  * measures the shipped path.
  * Usage: runMain graft.tools.V16Diag <sfDir>
  */
object V16Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[v16-diag] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    t("v16 full (state build)") {
      graft.SparkEntry.queries("v16_ivfpq_multires")(spark, sfDir).count()
    }
    for (i <- 1 to 2) {
      val (_, _, route, dtab, codes) =
        graft.queries.Vectors.v16Pieces(spark, sfDir)
      t(s"noop route r$i") { noop(route) }
      t(s"noop dtab r$i") { noop(dtab) }
      t(s"noop codes r$i") { noop(codes) }
      t(s"v16 full r$i") {
        graft.SparkEntry.queries("v16_ivfpq_multires")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
