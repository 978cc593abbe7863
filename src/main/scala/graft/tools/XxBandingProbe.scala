package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the xx-family measured (depth, bands) for a corpus — the
  * banding `GRAFT_T28_BANDING=auto` dispatches t28b's scale path to
  * (the BASELINE.md attribution needs the number; the gate itself
  * memoizes it silently).
  *
  * Usage: runMain graft.tools.XxBandingProbe [dir]
  */
object XxBandingProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale/x10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val t0 = System.nanoTime()
    val (d, b) = graft.queries.Text.autoRowsXxForTesting(spark, dir)
    println(f"[xxbanding] dir=$dir depth=$d bands=$b " +
      f"probe=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
