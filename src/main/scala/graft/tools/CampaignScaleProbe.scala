package graft.tools

import graft.dsl.{QAnd, QCond, QEq, QTrue}
import graft.engine._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off diagnostic: N-simulation campaign (the reference's real
  * workload shape — extract/report.py:106-123 fans out per sim) timed
  * through the single multi-path FileScan (`spikesBulk`) vs the
  * per-simulation union fallback. Usage: runMain graft.tools.
  * CampaignScaleProbe [nSims] [rowsPerSim]
  */
object CampaignScaleProbe {
  def main(args: Array[String]): Unit = {
    val nSims = args.headOption.map(_.toInt).getOrElse(100)
    val rowsPerSim = args.lift(1).map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft-cscale").toString
    (0 until nSims).foreach { i =>
      spark.range(rowsPerSim).select(
          (rand(seed = i) * 1000.0).as("time"),
          (col("id") % 50).as("gid"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/sims/sim$i")
    }
    spark.range(50).select(col("id").as("gid"),
        concat(lit("m"), col("id") % 4).as("mtype"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/nodes")

    val campaign = Campaign(
      name = "cscale", pathPrefix = "", attrs = Map.empty,
      rows = (0 until nSims).map(i => Map[String, Any](
        "simulation_path" -> s"$dir/sims/sim$i",
        "circuit_path" -> s"$dir/nodes")))
    val cfg = SingleAnalysisConfig(
      name = "cscale", reportType = "spikes",
      windows = Map("w" -> WindowSpec(bounds = (0.0, 500.0))),
      neuronClasses = Map(
        "m0" -> NeuronClassSpec(query = QAnd("mtype" -> QCond(QEq("m0"))))),
      features = Nil)

    def time(label: String, adapter: DataAdapter): Unit = {
      val an = new Analyzer(spark, cfg, campaign, adapter, QTrue, None)
      val agg = () => an.report
        .groupBy("simulation_id", "neuron_class").count().collect().length
      agg() // warm
      val t0 = System.nanoTime()
      val n = agg()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label: ${sec}%.2f s ($n groups, $nSims sims x $rowsPerSim rows)")
    }
    time("bulk-scan", new ParquetAdapter)
    time("union    ", new ParquetAdapter {
      override def spikesBulk(
          spark: SparkSession, sims: Seq[(Int, Int, String)]): Option[DataFrame] = None
    })
    spark.stop()
  }
}
