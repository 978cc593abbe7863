package graft.tools

import org.apache.spark.sql.SparkSession

/** Print a gate query's formatted physical plan — the `.explain` loop
  * the build discipline calls for, runnable against any sf dir without
  * touching the gate itself.
  *
  * Usage: runMain graft.tools.PlanDump <dir> <queryName...>
  */
object PlanDump {

  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"==== $n ====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
