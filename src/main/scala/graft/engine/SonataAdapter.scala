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
  * @param population   restrict to one SONATA population (None = all)
  * @param reportName   frame report name (None = the first one configured)
  */
class SonataAdapter(
    population: Option[String] = None,
    reportName: Option[String] = None) extends DataAdapter {

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
    * Each Spark task reads a contiguous frame-row slab of the data matrix.
    */
  def frames(spark: SparkSession, simulationPath: String): DataFrame = {
    import spark.implicits._
    val file = reportFile(simulationPath)
    val h5 = new Hdf5File(file)
    val (pops, metaByPop) =
      try {
        val ps = h5.ls("/report").filter(p => population.forall(_ == p))
        (ps, ps.map { pop =>
          val base = s"/report/$pop"
          val dims = h5.dims(s"$base/data")
          val time = h5.readDoubles(s"$base/mapping/time")
          val nodeIds = h5.readLongs(s"$base/mapping/node_ids")
          val idx =
            if (h5.exists(s"$base/mapping/index_pointers"))
              h5.readLongs(s"$base/mapping/index_pointers")
            else (0L to nodeIds.length.toLong).toArray
          val elems =
            if (h5.exists(s"$base/mapping/element_ids"))
              h5.readLongs(s"$base/mapping/element_ids")
            else new Array[Long](dims(1).toInt)
          pop -> (dims, time, nodeIds, idx, elems)
        }.toMap)
      } finally h5.close()
    val hasSections = metaByPop.values.exists { case (dims, _, nodeIds, _, elems) =>
      elems.exists(_ != 0) || dims(1) != nodeIds.length
    }
    // one slice spec per (population, frame-row range): ~4 MB of f32 each
    val rowsPerSlice = math.max(1, 4 * 1024 * 1024 / math.max(1, metaByPop.values
      .map(_._1(1)).max.toInt * 4))
    val slices = pops.flatMap { pop =>
      val nFrames = metaByPop(pop)._1(0)
      (0L until nFrames by rowsPerSlice).map(s =>
        (pop, s, math.min(s + rowsPerSlice, nFrames)))
    }
    val bMeta = spark.sparkContext.broadcast(metaByPop)
    val base = spark.createDataset(slices).repartition(slices.size.max(1))
      .flatMap { case (pop, r0, r1) =>
        val (dims, time, nodeIds, idx, elems) = bMeta.value(pop)
        val nCols = dims(1).toInt
        val Array(start, _, step) = time
        // column → owning node, expanded once per slice
        val colNode = new Array[Long](nCols)
        var k = 0
        while (k < nodeIds.length) {
          var j = idx(k)
          while (j < idx(k + 1)) { colNode(j.toInt) = nodeIds(k); j += 1 }
          k += 1
        }
        val f = new Hdf5File(file)
        try {
          val slab = f.readDoubles(s"/report/$pop/data", r0 * nCols, r1 * nCols)
          (r0 until r1).iterator.flatMap { r =>
            val t = start + r * step
            (0 until nCols).iterator.map { j =>
              (t, colNode(j), slab(((r - r0) * nCols).toInt + j), elems(j))
            }
          }.toVector
        } finally f.close()
      }
      .toDF("time", "gid", "value", "section")
    if (hasSections) base else base.drop("section")
  }

  // ---- node tables --------------------------------------------------------

  /** SONATA node table → one row per node: `gid` (the 0-based SONATA node
    * id) + every property of group 0 (numeric as double/long, strings as
    * string, `dynamics_params/<name>` flattened) — what bluepysnap's
    * NodePopulation.get() materializes (reference circuit.py).
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
    val h5 = new Hdf5File(nodesFile)
    try {
      val pops = h5.ls("/nodes").filter(p => population.forall(_ == p))
      require(pops.nonEmpty,
        s"population ${population.getOrElse("<any>")} not found in $nodesFile " +
          s"(available: ${h5.ls("/nodes").mkString(", ")})")
      val frames = pops.map { pop =>
        val g = s"/nodes/$pop/0"
        def leaves(p: String, prefix: String): Seq[(String, String)] = {
          val children = try h5.ls(p) catch { case _: Exception => Nil }
          if (children.isEmpty) Seq(prefix -> p)
          else children.filterNot(_ == "@library").flatMap(c =>
            leaves(s"$p/$c", if (prefix.isEmpty) c else s"$prefix/$c"))
        }
        val props = leaves(g, "")
        val n = h5.dims(s"$g/${props.head._1}").product.toInt
        // @library indirection: <prop> ints index @library/<prop> strings
        def libValues(name: String): Option[Array[String]] =
          if (h5.exists(s"$g/@library/$name")) Some(h5.readStrings(s"$g/@library/$name"))
          else None
        val cols: Seq[(String, Array[_])] = props.map { case (name, dsPath) =>
          val asStrings = try Some(h5.readStrings(dsPath)) catch { case _: Exception => None }
          asStrings match {
            case Some(ss) => name -> ss
            case None =>
              libValues(name) match {
                case Some(lib) =>
                  name -> h5.readLongs(dsPath).map(i => lib(i.toInt))
                case None =>
                  // int64 node ids/params above 2^53 would lose precision
                  // as Double — keep integer-typed properties as Long
                  if (h5.isIntegerType(dsPath)) name -> h5.readLongs(dsPath)
                  else name -> h5.readDoubles(dsPath)
              }
          }
        }
        val schema = org.apache.spark.sql.types.StructType(
          org.apache.spark.sql.types.StructField("gid",
            org.apache.spark.sql.types.LongType) +:
            cols.map { case (nm, arr) =>
              org.apache.spark.sql.types.StructField(nm.replace('/', '_'), arr match {
                case _: Array[String] => org.apache.spark.sql.types.StringType
                case _: Array[Long] => org.apache.spark.sql.types.LongType
                case _ => org.apache.spark.sql.types.DoubleType
              })
            })
        val rows = (0 until n).map { i =>
          org.apache.spark.sql.Row.fromSeq(i.toLong +: cols.map(_._2(i)))
        }
        spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
          .withColumn("population", lit(pop))
      }
      frames.reduce(_ unionByName _)
    } finally h5.close()
  }
}
