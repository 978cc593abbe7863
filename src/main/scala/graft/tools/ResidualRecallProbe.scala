package graft.tools

import org.apache.spark.sql.SparkSession

/** The r18 isolation experiment: raw-vector PQ vs residual PQ (v15)
  * recall@10 under EXACT routing — routing held exact so the only
  * variable is what the 8 code bytes encode. Prints the BASELINE rows.
  *
  * Usage: runMain graft.tools.ResidualRecallProbe [dir]
  * (default /tmp/scale/x100)
  */
object ResidualRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale/x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val ((rawAdc, rawRef), (resAdc, resRef)) =
      graft.queries.Vectors.measureResidualRecall(spark, dir)
    val pool = graft.queries.Vectors.E2eRefinePool
    println(f"[residual] dir=$dir pool=$pool k=${graft.queries.Vectors.E2eK} " +
      f"(exact routing) raw ADC=$rawAdc%.3f refine=$rawRef%.3f | " +
      f"RESIDUAL ADC=$resAdc%.3f refine=$resRef%.3f " +
      f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
    spark.stop()
  }
}
