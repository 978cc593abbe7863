package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall seconds at
  * SPARK_GRAFT_SF_DIR. Protocol: one un-timed warm-up pass (JVM/codegen/
  * parquet-footer warm-up — otherwise whichever query runs first absorbs
  * ~30 s of JIT noise), then two timed passes, reporting the min — the
  * steady-state plan cost a long-running cluster job would see.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = SparkEntry.queries.keys.toSeq.sorted
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(time) // warm-up pass, un-timed
    val r1 = names.map(n => n -> time(n)).toMap
    val r2 = names.map(n => n -> time(n)).toMap
    val best = names.map(n => n -> math.min(r1(n), r2(n))).toMap
    val qs = names.map(n => "\"" + n + "\":" + best(n)).mkString("{", ",", "}")
    val total = best.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
