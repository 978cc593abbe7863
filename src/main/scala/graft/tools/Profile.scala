package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev profiler: run named queries twice (cold/warm) and optionally dump
  * the formatted plan. Usage: runMain graft.tools.Profile <sfDir> q1 q2 ...
  * with -Dgraft.explain=true for plans.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      if (sys.env.get("GRAFT_EXPLAIN").contains("1"))
        fn(spark, sfDir).explain("formatted")
      val runs = sys.env.get("GRAFT_PROFILE_RUNS").map(_.toInt).getOrElse(2)
      for (i <- 1 to runs) {
        val t0 = System.nanoTime()
        // count() lets the optimizer drop a map-only query's projections
        // entirely; FORCE materializes every output row instead
        val cnt =
          if (sys.env.get("GRAFT_PROFILE_FORCE").contains("1"))
            fn(spark, sfDir).queryExecution.toRdd.count()
          else fn(spark, sfDir).count()
        println(f"[profile] $n run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$cnt")
      }
    }
    spark.stop()
  }
}
