package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spike-file conversion utilities (reference:
  * src/blueetl/converters/convert_spikes.py — CSV in, normalized sorted
  * table + import statistics out; the reference writes SONATA HDF5, we
  * write parquet, the format the rest of the engine scans).
  */
object Convert {

  private val TimeAliases = Seq("time", "times", "timestamps", "t")
  private val GidAliases = Seq("gid", "ids", "node_ids", "id")

  /** Read a delimited spikes file, normalize column names to (time, gid),
    * sort by (time, gid) (reference: convert_spikes.py:94-107).
    */
  def readSpikesCsv(spark: SparkSession, path: String, sep: String = " "): DataFrame = {
    val raw = spark.read
      .option("header", "true").option("sep", sep).option("inferSchema", "true")
      .csv(path)
    val cols = raw.columns.map(_.toLowerCase)
    def pick(aliases: Seq[String], what: String): String =
      aliases.find(cols.contains).map(a => raw.columns(cols.indexOf(a)))
        .getOrElse(throw new IllegalArgumentException(
          s"no $what column among ${raw.columns.mkString(",")}"))
    raw.select(
        col(pick(TimeAliases, "time")).cast("double").as("time"),
        col(pick(GidAliases, "gid")).cast("long").as("gid"))
      .orderBy("time", "gid")
  }

  /** Import statistics (reference: convert_spikes.py:110-130). */
  def importStats(spikes: DataFrame): DataFrame =
    spikes.agg(
      count(lit(1)).as("n_rows"),
      countDistinct("gid").as("n_ids"),
      min("gid").as("min_id"), max("gid").as("max_id"),
      min("time").as("min_time"), max("time").as("max_time"))

  /** Full conversion: CSV → sorted parquet + stats. */
  def convert(spark: SparkSession, csvPath: String, outPath: String, sep: String = " "): DataFrame = {
    val spikes = readSpikesCsv(spark, csvPath, sep)
    spikes.write.mode("overwrite").parquet(outPath)
    importStats(spark.read.parquet(outPath))
  }
}
