package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spike-file conversion utilities (reference:
  * src/blueetl/converters/convert_spikes.py — CSV in, normalized sorted
  * table + import statistics out; the reference writes SONATA HDF5, we
  * write parquet, the format the rest of the engine scans).
  */
object Convert {

  private[engine] val log = org.slf4j.LoggerFactory.getLogger(Convert.getClass)

  /** Driver-side row bound for the optional SONATA .h5 interop write in
    * [[convertCampaign]]: collected `Row`s cost ~100 B each, so the default
    * keeps the collect around 2 GiB of driver heap.
    */
  val DefaultMaxH5Rows: Long = 20000000L

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

  /** CSV → a complete runnable synthetic campaign, the graft analog of the
    * reference converter's whole-scaffold output (convert_spikes.py:232-320
    * `main`): alongside the sorted spikes table it writes a synthetic
    * circuit, node sets, simulation + campaign configs, and an analysis
    * config — so a user holding only a spikes file gets a directory that
    * `graft.Main run` analyzes end-to-end, exactly as `blueetl
    * convert-spikes` output feeds `blueetl run`.
    *
    * Layout (reference layout in convert_spikes.py:288-301, with parquet
    * where the reference writes SONATA HDF5 — see the SONATA interop
    * contract in README.md):
    *
    * {{{
    * <out>/
    * ├── analysis_config.yaml              # version 4, cache → analysis/
    * ├── circuit/
    * │   ├── circuit_config.json           # partial SONATA-style config
    * │   ├── node_sets.json                # {"empty": …} as the reference
    * │   └── synthetic_nodes.parquet       # gid 0..max_id (size max_id+1)
    * ├── simulation/
    * │   ├── simulation_config.json        # run.tstop = max timestamp
    * │   └── synthetic_spikes.parquet      # (time DOUBLE ms, gid BIGINT)
    * └── simulation_campaign_config.json   # blueetl-format, 1 simulation
    * }}}
    *
    * Contract guarantees (round-trip tested in ConvertCampaignSpec):
    *  - spikes sorted by (time, gid) — reference `_load_csv` sort_values
    *    on [timestamps, node_ids] (convert_spikes.py:94-107);
    *  - time is float64 milliseconds, gid fits uint64→long — reference
    *    DTYPES (convert_spikes.py:18-21) and the `units: ms` attr;
    *  - the node table has `size = max_id + 1` rows (convert_spikes.py:265);
    *  - the campaign config loads through [[ConfigIO.loadCampaign]] and the
    *    analysis config through [[ConfigIO.loadAnalysis]] unmodified.
    *
    * Returns the import statistics frame (same shape as [[importStats]]).
    */
  def convertCampaign(
      spark: SparkSession, csvPath: String, outDir: String,
      nodePopulation: String = "synthetic", sep: String = " ",
      maxH5Rows: Long = Convert.DefaultMaxH5Rows): DataFrame = {
    import java.nio.file.{Files, Paths}
    val base = Paths.get(outDir).toAbsolutePath
    Files.createDirectories(base.resolve("circuit"))
    Files.createDirectories(base.resolve("simulation"))

    val spikesPath = base.resolve("simulation/synthetic_spikes.parquet").toString
    val spikes = readSpikesCsv(spark, csvPath, sep)
    spikes.write.mode("overwrite").parquet(spikesPath)
    val stats = importStats(spark.read.parquet(spikesPath))
    val row = stats.collect()(0)
    val nRows = row.getLong(0)
    val maxId = row.getLong(3)
    val maxTime = row.getDouble(5)

    // SONATA interop back-channel (S8, reference _write_spikes
    // convert_spikes.py:133-145): the same sorted spikes as a real SONATA
    // .h5, so downstream SONATA tooling can consume the conversion too.
    // Driver-side collect is the reference's own working set (pandas holds
    // the whole frame) — but it is a DRIVER-MEMORY bound, so campaigns over
    // `maxH5Rows` get parquet-only output with an explicit message instead
    // of an OOM'd driver; the engine-scale interchange stays parquet.
    if (nRows <= maxH5Rows) {
      val sorted = spark.read.parquet(spikesPath).orderBy("time", "gid").collect()
      graft.sources.Hdf5Writer.writeSonataSpikes(
        base.resolve("simulation/synthetic_spikes.h5").toString,
        nodePopulation,
        sorted.map(_.getDouble(0)),
        sorted.map(_.getLong(1)))
    } else {
      Convert.log.warn(
        s"skipping SONATA .h5 interop write: $nRows spike rows exceed the " +
          s"driver-side bound of $maxH5Rows (raise maxH5Rows to force); " +
          "the parquet campaign output is complete without it")
    }

    // synthetic circuit: one row per node id 0..max_id with a placeholder
    // property (reference writes an empty CellCollection of the same size,
    // convert_spikes.py:148-157; `_` is its literal placeholder column)
    spark.range(maxId + 1)
      .select(col("id").as("gid"), lit(0).cast("int").as("_"))
      .coalesce(1)
      .write.mode("overwrite").parquet(base.resolve("circuit/synthetic_nodes.parquet").toString)

    def json(path: java.nio.file.Path, v: Any): Unit =
      Files.writeString(path, ConfigIO.canonical(v))

    // node_sets.json (reference convert_spikes.py:160-170)
    json(base.resolve("circuit/node_sets.json"),
      Map("empty" -> Map("population" -> nodePopulation, "node_id" -> Seq.empty[Long])))

    // partial circuit config (reference convert_spikes.py:173-193)
    json(base.resolve("circuit/circuit_config.json"), Map(
      "version" -> "2.4",
      "metadata" -> Map("status" -> "partial"),
      "node_sets_file" -> "node_sets.json",
      "networks" -> Map(
        "nodes" -> Seq(Map(
          "nodes_file" -> "synthetic_nodes.parquet",
          "populations" -> Map(nodePopulation -> Map.empty[String, Any]))),
        "edges" -> Seq.empty[Any])))

    // simulation config (reference convert_spikes.py:196-220)
    json(base.resolve("simulation/simulation_config.json"), Map(
      "version" -> "2.4",
      "network" -> "../circuit/circuit_config.json",
      "run" -> Map("tstop" -> math.ceil(maxTime), "dt" -> 1.0, "random_seed" -> 0),
      "output" -> Map("output_dir" -> ".", "spikes_file" -> "synthetic_spikes.parquet"),
      "metadata" -> Map("note" -> "Synthetic simulation")))

    // campaign config, native blueetl row format with a single simulation
    // (reference convert_spikes.py:223-245, dump_json). graft adapters take
    // the data path directly (Model.scala xarrayCampaign note), so
    // simulation_path points at the spikes table and circuit_path at the
    // node table.
    json(base.resolve("simulation_campaign_config.json"), Map(
      "format" -> "blueetl",
      "version" -> 1,
      "name" -> "synthetic",
      "attrs" -> Map(
        "path_prefix" -> base.toString,
        "circuit_config" -> base.resolve("circuit/circuit_config.json").toString),
      "data" -> Seq(Map(
        "simulation_path" -> "simulation/synthetic_spikes.parquet",
        "circuit_path" -> base.resolve("circuit/synthetic_nodes.parquet").toString))))

    // analysis config scaffold (reference convert_spikes.py:248-296): the
    // reference's w1/w2 windows + all-class + per-class features, expressed
    // in the graft v4 schema with the built-in feature registry
    ConfigIO.dumpYaml(base.resolve("analysis_config.yaml").toString, Map(
      "version" -> 4,
      "simulation_campaign" -> base.resolve("simulation_campaign_config.json").toString,
      "cache" -> Map("path" -> base.resolve("analysis").toString),
      "analysis" -> Map(
        "spikes" -> Map(
          "extraction" -> Map(
            "report" -> Map("type" -> "spikes"),
            "neuron_classes" -> Map("all" -> Map.empty[String, Any]),
            "windows" -> Map(
              "w1" -> Map("bounds" -> Seq(0.0, 1000.0)),
              "w2" -> Map("bounds" -> Seq(1000.0, 2000.0)))),
          "features" -> Seq(Map(
            "groupby" -> Seq("simulation_id", "circuit_id", "neuron_class", "window"),
            "function" -> "mean_firing_rates"))))))
    stats
  }
}
