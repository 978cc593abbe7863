package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable IO backends (the adapter SPI — reference:
  * src/blueetl/adapters/base.py:19-45, interfaces/simulation.py:16-21).
  * The engine is format-agnostic: an adapter yields a spike/frame event
  * table per simulation and a node-property table per circuit; everything
  * downstream is relational.
  *
  * Times are DoubleType in adapter output (the reference pins float64 ms,
  * constants.py:34-47); gid is LongType.
  */
trait DataAdapter extends Serializable {

  /** Spike events of one simulation: (time: double, gid: long). */
  def spikes(spark: SparkSession, simulationPath: String): DataFrame

  /** Frame report of one simulation: (time: double, gid: long,
    * value: double[, section: long]) — soma/compartment style.
    */
  def frames(spark: SparkSession, simulationPath: String): DataFrame

  /** Node properties of one circuit: (gid: long) + property columns. */
  def nodes(spark: SparkSession, circuitPath: String): DataFrame

  /** Does the simulation exist / is it complete? Drives the status filter
    * (reference: src/blueetl/extract/simulations.py:41-86).
    */
  def isComplete(simulationPath: String): Boolean =
    new java.io.File(simulationPath).exists()
}

/** Plain-parquet adapter: a simulation is a parquet file/dir holding a long
  * event table with `time`/`gid` (spikes) or `time`/`gid`/`value` (frames)
  * columns; a circuit is a parquet node table with a `gid` column.
  * Filters and column pruning push into the scan via Catalyst.
  */
class ParquetAdapter extends DataAdapter {
  def spikes(spark: SparkSession, simulationPath: String): DataFrame =
    spark.read.parquet(simulationPath)
      .select(col("time").cast("double").as("time"), col("gid").cast("long").as("gid"))

  def frames(spark: SparkSession, simulationPath: String): DataFrame = {
    val df = spark.read.parquet(simulationPath)
    val base = Seq(
      col("time").cast("double").as("time"),
      col("gid").cast("long").as("gid"),
      col("value").cast("double").as("value"))
    val extra =
      if (df.columns.contains("section")) Seq(col("section").cast("long").as("section"))
      else Nil
    df.select(base ++ extra: _*)
  }

  def nodes(spark: SparkSession, circuitPath: String): DataFrame =
    spark.read.parquet(circuitPath).withColumn("gid", col("gid").cast("long"))
}

/** Adapter whose simulations are directories of text spike files, read
  * through the DSv2 `spikes-csv` source — filters and column pruning push
  * into the line parser (S2's native-format reader tier). Node tables
  * stay parquet.
  */
class CsvSpikesAdapter extends ParquetAdapter {
  override def spikes(spark: SparkSession, simulationPath: String): DataFrame =
    spark.read.format("spikes-csv").load(simulationPath)
}

/** Adapter over the synthetic `events` table (TESTDATA.md): each
  * "simulation" is an events parquet; time = µs since the stream origin as
  * double, gid = user_id. The node table is derived from the distinct gids
  * with simple properties so neuron-class queries have something to filter
  * on. Used by the engine end-to-end oracle queries and specs.
  */
class EventsAdapter extends DataAdapter {
  private def raw(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path)
      .withColumn("time",
        (expr("ts div 1000") - lit(graft.Tables.EventsEpochMicros)).cast("double"))
      .withColumnRenamed("user_id", "gid")
  }

  def spikes(spark: SparkSession, simulationPath: String): DataFrame =
    raw(spark, simulationPath).select("time", "gid")

  def frames(spark: SparkSession, simulationPath: String): DataFrame =
    raw(spark, simulationPath).select(col("time"), col("gid"), col("value").cast("double").as("value"))

  /** Node table: distinct gids with derived properties (parity, cohort). */
  def nodes(spark: SparkSession, circuitPath: String): DataFrame =
    raw(spark, circuitPath).select("gid").distinct()
      .withColumn("parity", (col("gid") % 2).cast("long"))
      .withColumn("cohort", (col("gid") % 5).cast("long"))
}
