package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build a GenScale index WITH its persisted recall curve and dump the
  * curve — the BASELINE rows for what `GRAFT_IVF_RECALL_E2E` actually
  * prices per tier (routing / raw ADC / raw refine / residual ADC /
  * residual refine, single- and multi-cell). Bound the held-out sample
  * with GRAFT_IVF_RECALL_SAMPLE (the e2e pass trains TWO codebooks over
  * the corpus and runs a brute truth pass — the honest one-time cost of
  * measuring the tiers an index serves).
  *
  * Usage: runMain graft.tools.CurveProfile <sfDir>
  */
object CurveProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val root = graft.queries.Vectors.ivfIndexForTesting(spark, dir)
    println(f"[curve] index+curve build: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val df = spark.read.parquet(s"$root/recall_curve").orderBy("nprobe")
    df.collect().foreach { r =>
      println(f"[curve] nprobe=${r.getInt(0)}%3d routing=${r.getDouble(1)}%.3f " +
        f"adc=${r.getDouble(2)}%.3f refine=${r.getDouble(3)}%.3f " +
        f"adc_multi=${r.getDouble(4)}%.3f refine_multi=${r.getDouble(5)}%.3f " +
        f"adc_resid=${r.getDouble(6)}%.3f refine_resid=${r.getDouble(7)}%.3f " +
        f"adc_resid_multi=${r.getDouble(8)}%.3f " +
        f"refine_resid_multi=${r.getDouble(9)}%.3f enc=${r.getString(10)}")
    }
    graft.queries.Vectors.clearIndexCache(spark)
    spark.stop()
  }
}
