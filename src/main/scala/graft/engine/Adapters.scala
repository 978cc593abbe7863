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

  /** Does the simulation hold complete, readable data? Adapters refine this
    * (e.g. nonempty parquet); with [[status]] it drives the three-valued
    * status of reference extract/simulations.py:41-86.
    */
  def isComplete(simulationPath: String): Boolean =
    new java.io.File(simulationPath).exists()

  /** Three-valued simulation status (reference
    * extract/simulations.py:22-27,62-76): MISSING when the path is absent
    * (manually deleted), INCOMPLETE when present but not yet fully written
    * (still running / crashed), COMPLETE otherwise. Fresh extraction keeps
    * only COMPLETE; cached loads keep every status
    * (simulations.py:115-166).
    */
  def status(simulationPath: String): String =
    if (!new java.io.File(simulationPath).exists()) "MISSING"
    else if (isComplete(simulationPath)) "COMPLETE"
    else "INCOMPLETE"

  /** Optional bulk form: all simulations' spikes in ONE scan, returning
    * (simulation_id, circuit_id, time, gid). A per-simulation union builds
    * an N-branch plan — fine for hundreds of sims, heavy for thousands;
    * a multi-path scan + file→simulation mapping keeps the plan one scan
    * regardless of campaign size. None = caller falls back to the union.
    */
  def spikesBulk(
      spark: SparkSession, sims: Seq[(Int, Int, String)]): Option[DataFrame] = None

  /** Bulk form for frame reports: (simulation_id, circuit_id, time, gid,
    * value[, section]). Same contract as [[spikesBulk]].
    */
  def framesBulk(
      spark: SparkSession, sims: Seq[(Int, Int, String)]): Option[DataFrame] = None
}

/** Plain-parquet adapter: a simulation is a parquet file/dir holding a long
  * event table with `time`/`gid` (spikes) or `time`/`gid`/`value` (frames)
  * columns; a circuit is a parquet node table with a `gid` column.
  * Filters and column pruning push into the scan via Catalyst.
  */
class ParquetAdapter extends DataAdapter {
  /** Complete = the path holds actual data: a nonempty file, or a directory
    * with at least one nonempty data file (ignoring _SUCCESS/.crc markers).
    * An empty file or a bare directory is a sim still being written —
    * INCOMPLETE, not MISSING (reference simulations.py:64-76 distinguishes
    * "exists but not complete" from "manually deleted").
    */
  override def isComplete(simulationPath: String): Boolean = {
    val f = new java.io.File(simulationPath)
    if (f.isFile) f.length > 0
    else Option(f.listFiles()).getOrElse(Array.empty).exists(c =>
      c.isFile && c.length > 0 && !c.getName.startsWith("_") && !c.getName.startsWith("."))
  }

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

  /** One multi-path scan over every simulation's parquet; rows map back to
    * their simulation by `input_file_name` prefix against the (tiny,
    * broadcast) campaign mapping. The plan stays a single FileScan no
    * matter how many simulations the campaign has.
    */
  override def spikesBulk(
      spark: SparkSession, sims: Seq[(Int, Int, String)]): Option[DataFrame] =
    bulk(spark, sims, Nil)

  override def framesBulk(
      spark: SparkSession, sims: Seq[(Int, Int, String)]): Option[DataFrame] =
    bulk(spark, sims, Seq("value", "section"))

  /** One multi-path scan + file→simulation mapping (see spikesBulk doc).
    * `extras` are optional columns included when the merged schema has
    * them (value/section for frame reports).
    *
    * The mapping is an EQUI-join (hashable, one probe per row) — a
    * `startsWith` theta-join would plan as a broadcast nested loop doing
    * O(#sims) prefix tests per event, exactly on the 1000+-sim campaigns
    * this path exists for. Plain-file sims key by exact file path;
    * directory sims key by the directory, which is the parent of every
    * leaf file in the flat layouts this scan supports. Sims with NESTED
    * directories (hive-partitioned) return None — Spark's multi-path read
    * rejects mixed directory structures outright, so those campaigns take
    * the per-simulation union path instead.
    */
  private def bulk(
      spark: SparkSession, sims: Seq[(Int, Int, String)],
      extras: Seq[String]): Option[DataFrame] = {
    if (sims.isEmpty) return None
    // two sims sharing one path would double-read the file in the
    // multi-path scan AND fan out on the mapping join — union instead
    if (sims.map(_._3).distinct.size != sims.size) return None
    import spark.implicits._
    def hasSubdirs(f: java.io.File): Boolean =
      Option(f.listFiles()).getOrElse(Array.empty).exists(_.isDirectory)
    val (dirSims, fileSims) =
      sims.partition { case (_, _, p) => new java.io.File(p).isDirectory }
    if (dirSims.exists { case (_, _, p) => hasSubdirs(new java.io.File(p)) })
      return None
    val fileKeys = fileSims.map { case (sid, cid, p) =>
      (sid, cid, new java.io.File(p).getAbsolutePath)
    }
    val dirKeys = dirSims.map { case (sid, cid, p) =>
      (sid, cid, new java.io.File(p).getAbsolutePath.stripSuffix("/"))
    }
    val raw = spark.read.option("mergeSchema", "true").parquet(sims.map(_._3): _*)
    val present = extras.filter(raw.columns.contains)
    val castType = Map("value" -> "double", "section" -> "long")
    // input_file_name yields a URI (file:/ or file:///) — strip the scheme
    // so keys compare as plain absolute paths
    val scanned = raw.select(
      Seq(
        col("time").cast("double").as("time"), col("gid").cast("long").as("gid")) ++
        present.map(n => col(n).cast(castType(n)).as(n)) :+
        regexp_replace(input_file_name(), "^[a-z]+:/+", "/").as("_file"): _*)
      .withColumn("_dir", regexp_replace(col("_file"), "/[^/]*$", ""))
    val fm = broadcast(fileKeys.toDF("f_sid", "f_cid", "fkey"))
    val dm = broadcast(dirKeys.toDF("d_sid", "d_cid", "dkey"))
    val out = Seq("simulation_id", "circuit_id", "time", "gid") ++ present
    val joined =
      if (fileKeys.isEmpty)
        scanned.join(dm, col("_dir") === col("dkey"))
          .withColumnsRenamed(Map("d_sid" -> "simulation_id", "d_cid" -> "circuit_id"))
      else if (dirKeys.isEmpty)
        scanned.join(fm, col("_file") === col("fkey"))
          .withColumnsRenamed(Map("f_sid" -> "simulation_id", "f_cid" -> "circuit_id"))
      else
        // mixed campaign: match exact file first, then containing dir
        scanned
          .join(fm, col("_file") === col("fkey"), "left")
          .join(dm, col("_dir") === col("dkey"), "left")
          .filter(col("f_sid").isNotNull || col("d_sid").isNotNull)
          .withColumn("simulation_id", coalesce(col("f_sid"), col("d_sid")))
          .withColumn("circuit_id", coalesce(col("f_cid"), col("d_cid")))
    Some(joined.select(out.map(col): _*))
  }
}

/** Adapter whose simulations are directories of text spike files, read
  * through the DSv2 `spikes-csv` source — filters and column pruning push
  * into the line parser (S2's native-format reader tier). Node tables
  * stay parquet.
  */
class CsvSpikesAdapter extends ParquetAdapter {
  override def spikes(spark: SparkSession, simulationPath: String): DataFrame =
    spark.read.format("spikes-csv").load(simulationPath)
  // spikes are NOT parquet here — fall back to the per-simulation union
  override def spikesBulk(
      spark: SparkSession, sims: Seq[(Int, Int, String)]): Option[DataFrame] = None
}

/** Adapter over the synthetic `events` table (TESTDATA.md): each
  * "simulation" is an events parquet; time = µs since the stream origin as
  * double, gid = user_id. The node table is derived from the distinct gids
  * with simple properties so neuron-class queries have something to filter
  * on. Used by the engine end-to-end oracle queries and specs.
  */
class EventsAdapter extends DataAdapter {
  protected def raw(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.functions.GraftFunctions.register(spark)
    val df = spark.read.parquet(path)
    df.withColumn("time",
        (graft.Tables.tsMicros(df) - lit(graft.Tables.EventsEpochMicros)).cast("double"))
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

/** EventsAdapter variant serving a COMPARTMENT-style frame report: every
  * sample carries a per-compartment `section` id alongside the value
  * (reference: extract/compartment_report.py:42-48 — the long frame gains
  * a section level under each gid). Sections are synthesized
  * deterministically from the event id (`event_id % 3`) so a DuckDB
  * oracle can replicate the whole extraction.
  */
class CompartmentEventsAdapter extends EventsAdapter {
  override def frames(spark: SparkSession, simulationPath: String): DataFrame =
    raw(spark, simulationPath).select(
      col("time"), col("gid"), col("value").cast("double").as("value"),
      (col("event_id") % 3).cast("long").as("section"))
}
