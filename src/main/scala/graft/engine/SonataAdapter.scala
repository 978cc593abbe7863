package graft.engine

import graft.sources.{Hdf5File, SonataSpikesSource}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Paths

/** Native SONATA HDF5 adapter — the format tier the reference reaches
  * through bluepysnap (adapters/impl/bluepysnap/simulation.py:16-60,
  * circuit.py): a simulation is a `simulation_config.json` whose `output`
  * section locates the spikes/frame reports, a circuit is a
  * `circuit_config.json` whose `networks.nodes` locates the node table.
  * All HDF5 decoding is the pure-JVM [[Hdf5File]]; no native library.
  *
  * Scale: spikes go through the `sonata-spikes` DSv2 source (row-range
  * partitions, plan-time time-window pushdown via the by_time sort order);
  * frame reports are scanned as row-range slices of the 2-D data matrix
  * (each task reads only its contiguous byte slab); node tables read
  * row-range-partitioned columns the same way.
  *
  * @param population     restrict to one SONATA population (None = all)
  * @param reportName     frame report name (None = the first one configured)
  * @param nodeSliceBytes target working-set bytes per node-table slice task
  */
class SonataAdapter(
    population: Option[String] = None,
    reportName: Option[String] = None,
    nodeSliceBytes: Long = SonataAdapter.NodeSliceBytes) extends DataAdapter {

  // ---- config resolution --------------------------------------------------

  /** simulation_config.json with `manifest` variable substitution
    * (bluepysnap semantics: `$VAR` entries in `manifest`, paths relative
    * to the config's directory).
    */
  private def simConfig(simulationPath: String): (Map[String, Any], java.nio.file.Path) = {
    val p = Paths.get(simulationPath)
    val cfgPath =
      if (simulationPath.endsWith(".json")) p
      else p.resolve("simulation_config.json")
    (ConfigIO.loadMap(cfgPath.toString), cfgPath.getParent)
  }

  private def substitute(v: String, manifest: Map[String, String]): String =
    // longest key first: with prefix-colliding vars ($BASE vs $BASE_DIR)
    // unordered-map iteration must not decide which one matches
    manifest.toSeq.sortBy(-_._1.length).foldLeft(v) {
      case (s, (k, repl)) => s.replace(k, repl)
    }

  private def resolved(cfg: Map[String, Any], dir: java.nio.file.Path, raw: String): String = {
    val manifest = cfg.getOrElse("manifest", Map.empty[String, Any])
      .asInstanceOf[Map[String, Any]].map { case (k, v) => k -> v.toString }
    // manifest entries may reference each other ($NETWORK_NODES_DIR =
    // $BASE_DIR/networks/nodes): substitute to a fixed point (bounded)
    val s = (1 to 4).foldLeft(raw)((acc, _) => substitute(acc, manifest))
    val path = Paths.get(s)
    (if (path.isAbsolute) path else dir.resolve(s)).normalize().toString
  }

  /** Absolute path of the spikes .h5 of a simulation (or the .h5 itself). */
  private[engine] def spikesFile(simulationPath: String): String =
    if (simulationPath.endsWith(".h5")) simulationPath
    else {
      val (cfg, dir) = simConfig(simulationPath)
      val out = cfg.getOrElse("output", Map.empty[String, Any]).asInstanceOf[Map[String, Any]]
      val outDir = resolved(cfg, dir, out.getOrElse("output_dir", ".").toString)
      Paths.get(outDir).resolve(out.getOrElse("spikes_file", "out.h5").toString).toString
    }

  /** Absolute path of the named (or first configured) frame report .h5. */
  private[engine] def reportFile(simulationPath: String): String =
    if (simulationPath.endsWith(".h5")) simulationPath
    else {
      val (cfg, dir) = simConfig(simulationPath)
      val out = cfg.getOrElse("output", Map.empty[String, Any]).asInstanceOf[Map[String, Any]]
      val outDir = resolved(cfg, dir, out.getOrElse("output_dir", ".").toString)
      val reports = cfg.getOrElse("reports", Map.empty[String, Any])
        .asInstanceOf[Map[String, Any]]
      val name = reportName.orElse(reports.keys.toSeq.sorted.headOption).getOrElse(
        throw new IllegalArgumentException(s"$simulationPath: no reports configured"))
      val fileName = reports.get(name).map(_.asInstanceOf[Map[String, Any]])
        .flatMap(_.get("file_name")).map(_.toString).getOrElse(name)
      Paths.get(outDir).resolve(
        if (fileName.endsWith(".h5")) fileName else s"$fileName.h5").toString
    }

  // ---- status -------------------------------------------------------------

  /** Reference is_complete: the spikes file exists
    * (adapters/impl/bluepysnap/simulation.py:22-28).
    */
  override def isComplete(simulationPath: String): Boolean =
    try new java.io.File(spikesFile(simulationPath)).length() > 0
    catch { case _: Exception => false }

  // ---- spikes -------------------------------------------------------------

  def spikes(spark: SparkSession, simulationPath: String): DataFrame = {
    val reader = spark.read.format("sonata-spikes")
    population.foreach(p => reader.option("population", p))
    reader.load(spikesFile(simulationPath))
      .select(col("time"), col("gid"))
  }

  // ---- frame reports ------------------------------------------------------

  /** Long form of a SONATA frame report
    * (`/report/<pop>/{data, mapping/{node_ids, index_pointers,
    * element_ids, time}}`): data is [n_frames × n_columns] float32; column
    * j belongs to node_ids(k) where index_pointers(k) <= j <
    * index_pointers(k+1), with element_ids(j) the within-node section —
    * soma reports have one column per node and all-zero element ids
    * (bluepysnap PopulationSomaReport vs PopulationCompartmentReport).
    * `section` is emitted only for genuine compartment reports.
    *
    * Reads through the `sonata-frames` DSv2 source: time filters collapse
    * the planned frame-row ranges at plan time (the reference pushes
    * t_start/t_stop into the reader the same way,
    * adapters/impl/bluepysnap/simulation.py:42-60), gid filters prune
    * column runs, and each task streams its contiguous row slab.
    */
  def frames(spark: SparkSession, simulationPath: String): DataFrame = {
    val file = reportFile(simulationPath)
    // driver-side metadata probe (mapping datasets only, never `data`):
    // soma reports emit (time, gid, value); compartments add `section`
    val h5 = new Hdf5File(file)
    val hasSections =
      try h5.ls("/report").filter(p => population.forall(_ == p)).exists { pop =>
        val base = s"/report/$pop"
        val nNodes = h5.dims(s"$base/mapping/node_ids").product
        h5.dims(s"$base/data")(1) != nNodes ||
          (h5.exists(s"$base/mapping/element_ids") &&
            h5.readLongs(s"$base/mapping/element_ids").exists(_ != 0))
      } finally h5.close()
    val reader = spark.read.format("sonata-frames")
    population.foreach(p => reader.option("population", p))
    val cols = Seq("time", "gid", "value") ++ (if (hasSections) Seq("section") else Nil)
    reader.load(file).select(cols.map(col): _*)
  }

  // ---- node tables --------------------------------------------------------

  /** SONATA node table → one row per node: `gid` (the 0-based SONATA node
    * id) + every property of group 0 (numeric as double/long, strings as
    * string, `dynamics_params/<name>` flattened) — what bluepysnap's
    * NodePopulation.get() materializes (reference circuit.py).
    *
    * Scale: the driver touches only metadata (property names, dtypes, the
    * small `@library` categorical arrays); every task reads a contiguous
    * row-range slab of each property column — a multi-million-node circuit
    * never materializes on the driver, and downstream neuron-class
    * filters/joins start from many partitions.
    */
  def nodes(spark: SparkSession, circuitPath: String): DataFrame = {
    val nodesFile =
      if (circuitPath.endsWith(".h5")) circuitPath
      else {
        val p = Paths.get(circuitPath)
        val cfgPath = if (circuitPath.endsWith(".json")) p else p.resolve("circuit_config.json")
        val cfg = ConfigIO.loadMap(cfgPath.toString)
        val nets = cfg.getOrElse("networks", Map.empty[String, Any])
          .asInstanceOf[Map[String, Any]]
        val nodes0 = nets.getOrElse("nodes", Seq.empty[Any]).asInstanceOf[Seq[Any]]
          .headOption.map(_.asInstanceOf[Map[String, Any]]).getOrElse(
            throw new IllegalArgumentException(s"$circuitPath: no networks.nodes"))
        // manifest vars may reference each other ($NETWORK_NODES_DIR =
        // $BASE_DIR/…) — resolve twice, then against the config dir
        resolved(cfg, cfgPath.getParent,
          nodes0.getOrElse("nodes_file", "").toString)
      }
    import SonataAdapter._
    val h5 = new Hdf5File(nodesFile)
    val plans: Seq[(String, Long, Seq[NodeProp])] =
      try {
        val pops = h5.ls("/nodes").filter(p => population.forall(_ == p))
        require(pops.nonEmpty,
          s"population ${population.getOrElse("<any>")} not found in $nodesFile " +
            s"(available: ${h5.ls("/nodes").mkString(", ")})")
        pops.map { pop =>
          val g = s"/nodes/$pop/0"
          def leaves(p: String, prefix: String): Seq[(String, String)] = {
            val children = try h5.ls(p) catch { case _: Exception => Nil }
            if (children.isEmpty) Seq(prefix -> p)
            else children.filterNot(_ == "@library").flatMap(c =>
              leaves(s"$p/$c", if (prefix.isEmpty) c else s"$prefix/$c"))
          }
          val props = leaves(g, "")
          val n = h5.dims(s"$g/${props.head._1}").product
          val specs = props.map { case (name, dsPath) =>
            // type probe reads at most ONE element — never a full column
            val isString =
              try { h5.readStrings(dsPath, 0, math.min(1L, n)); true }
              catch { case _: IllegalArgumentException => false }
            // @library indirection: <prop> ints index @library/<prop>
            // strings; the library itself is a small categorical array
            val lib =
              if (!isString && h5.exists(s"$g/@library/$name"))
                Some(h5.readStrings(s"$g/@library/$name"))
              else None
            val kind =
              if (isString) StrProp
              else if (lib.isDefined) LibProp
              // int64 node ids/params above 2^53 would lose precision as
              // Double — keep integer-typed properties as Long
              else if (h5.isIntegerType(dsPath)) LongProp
              else DoubleProp
            NodeProp(name.replace('/', '_'), dsPath, kind, lib)
          }
          (pop, n, specs)
        }
      } finally h5.close()
    val frames = plans.map { case (pop, n, specs) =>
      val schema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("gid",
          org.apache.spark.sql.types.LongType) +:
          specs.map(s =>
            org.apache.spark.sql.types.StructField(s.column, s.kind match {
              case LongProp => org.apache.spark.sql.types.LongType
              case DoubleProp => org.apache.spark.sql.types.DoubleType
              case _ => org.apache.spark.sql.types.StringType
            })))
      // ~rowsPerSlice × nProps × 8 B per task working set
      val rowsPerSlice = math.max(1L, nodeSliceBytes / math.max(1, specs.size * 8))
      val slices = (0L until n by rowsPerSlice)
        .map(s => (s, math.min(s + rowsPerSlice, n)))
      val rdd = spark.sparkContext
        .parallelize(slices, slices.size.max(1))
        .flatMap { case (r0, r1) =>
          val f = new Hdf5File(nodesFile)
          try {
            val cols: Seq[Array[_]] = specs.map { s =>
              s.kind match {
                case StrProp => f.readStrings(s.dsPath, r0, r1)
                case LibProp =>
                  val lib = s.lib.get
                  f.readLongs(s.dsPath, r0, r1).map(i => lib(i.toInt))
                case LongProp => f.readLongs(s.dsPath, r0, r1)
                case DoubleProp => f.readDoubles(s.dsPath, r0, r1)
              }
            }
            // materialized per slice (bounded) so the handle can close
            (r0 until r1).map { i =>
              org.apache.spark.sql.Row.fromSeq(
                i +: cols.map(_((i - r0).toInt)))
            }
          } finally f.close()
        }
      spark.createDataFrame(rdd, schema).withColumn("population", lit(pop))
    }
    frames.reduce(_ unionByName _)
  }
}

object SonataAdapter {
  /** Target working-set bytes of one node-table slice task (~16 MB). */
  val NodeSliceBytes: Long = 16L * 1024 * 1024

  sealed trait PropKind extends Serializable
  case object StrProp extends PropKind
  case object LibProp extends PropKind
  case object LongProp extends PropKind
  case object DoubleProp extends PropKind

  /** One node property column: flattened name, dataset path, decode kind,
    * and the broadcast-small `@library` categorical values when indirect.
    */
  final case class NodeProp(
      column: String, dsPath: String, kind: PropKind, lib: Option[Array[String]])
}
