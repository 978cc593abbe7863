package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** One-off diagnostic: rows surviving the parquet scan with/without
  * MicrosPushdown on a narrow time window (GenScale events dir).
  */
object PushProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(stripRule: Boolean): (Long, Long) = {
      val q = graft.Tables.spikes(spark, dir)
        .filter(col("time") >= 3600000000L && col("time") < 7200000000L)
      if (stripRule) // registration happens inside Tables.events, so strip AFTER building
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations.filterNot(_ == graft.plans.MicrosPushdown)
      val n = q.collect().length.toLong
      val scan = q.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case s: FileSourceScanExec => s }.get
      (n, scan.metrics("numOutputRows").value)
    }
    val (n1, scan1) = run(stripRule = false)
    val (n2, scan2) = run(stripRule = true)
    println(s"result_rows=$n1/$n2 scan_rows_with_rule=$scan1 scan_rows_without=$scan2")
    spark.stop()
  }
}
