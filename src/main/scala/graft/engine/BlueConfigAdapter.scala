package graft.engine

import graft.sources.Hdf5File
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}

/** Legacy BlueConfig / bluepy-tier config surface (reference:
  * adapters/impl/bluepy/{simulation,circuit}.py, dispatched for non-.json
  * simulation paths by adapters/simulation.py:26-30): a simulation is a
  * `BlueConfig` text file whose `Run` stanza locates the circuit
  * (`CircuitPath`, `CellLibraryFile` → MVD3) and outputs (`OutputRoot` →
  * `out.dat`/`out.h5` spikes + one `<name>.h5` per `Report` stanza);
  * targets come from `start.target`/`TargetFile` (`a<gid>` entries,
  * 1-based GIDs — the bluepy convention throughout this tier).
  */
object BlueConfig {

  /** One `Kind [Name] { key value … }` stanza of a BlueConfig-syntax file
    * (also CircuitConfig and .target files share the brace syntax).
    */
  final case class Section(kind: String, name: String, entries: Map[String, String])

  def parseString(text: String): Seq[Section] = {
    val out = Seq.newBuilder[Section]
    var header: Option[(String, String)] = None
    var entries = Map.newBuilder[String, String]
    var inBody = false
    for (raw <- text.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        if (!inBody) {
          if (line == "{") inBody = true
          else {
            val parts = line.split("\\s+", 2)
            header = Some((parts(0), if (parts.length > 1) parts(1).trim else ""))
            entries = Map.newBuilder[String, String]
            // `Kind Name {` on one line
            if (line.endsWith("{")) {
              header = header.map { case (k, n) => (k, n.stripSuffix("{").trim) }
              inBody = true
            }
          }
        } else if (line == "}") {
          header.foreach { case (k, n) => out += Section(k, n, entries.result()) }
          header = None
          inBody = false
        } else {
          val parts = line.split("\\s+", 2)
          entries += parts(0) -> (if (parts.length > 1) parts(1).trim else "")
        }
      }
    }
    out.result()
  }

  def parse(path: String): Seq[Section] =
    parseString(Files.readString(Paths.get(path)))

  /** `.target` file → target name → sorted 1-based gids. Bodies hold
    * `a<gid>` entries and/or names of other targets (resolved
    * recursively, cycle-safe); all target types (Cell, Compartment, …)
    * resolve to their gid set.
    */
  def targets(path: String): Map[String, Seq[Long]] = {
    val text = Files.readString(Paths.get(path))
    // bodies are whitespace-separated token lists that may span lines —
    // re-tokenize the brace blocks directly rather than via Section
    val tokens = text.replaceAll("#[^\n]*", " ")
      .split("\\s+").filter(_.nonEmpty).toList
    final case class Block(name: String, body: List[String])
    def blocks(ts: List[String], acc: List[Block]): List[Block] = ts match {
      case "Target" :: _ :: name :: "{" :: rest =>
        val (body, tail) = rest.span(_ != "}")
        blocks(tail.drop(1), Block(name, body) :: acc)
      case _ :: rest => blocks(rest, acc)
      case Nil => acc.reverse
    }
    val raw = blocks(tokens, Nil).map(b => b.name -> b.body).toMap
    val gidPat = "a(\\d+)".r
    def resolve(name: String, seen: Set[String]): Set[Long] =
      if (seen(name)) Set.empty
      else raw.getOrElse(name, Nil).toSet.flatMap { (tok: String) =>
        tok match {
          case gidPat(g) => Set(g.toLong)
          case ref if raw.contains(ref) => resolve(ref, seen + name)
          case _ => Set.empty[Long]
        }
      }
    raw.keys.map(n => n -> resolve(n, Set.empty).toSeq.sorted).toMap
  }
}

/** [[DataAdapter]] over BlueConfig simulations: spikes from
  * `OutputRoot/out.dat` (text) or `out.h5` (SONATA, node_id+1 → gid),
  * frame reports from the legacy flat layout through the `sonata-frames`
  * DSv2 source (plan-time time pushdown included), the cell table from
  * MVD3. GIDs are 1-based everywhere, matching bluepy.
  *
  * Scale: spikes/frames flow through the same DSv2 sources as the SONATA
  * tier (row-range slabs, pushdown); the MVD3 read distributes row-range
  * slices exactly like [[SonataAdapter.nodes]] — the driver touches only
  * metadata and the small `/library` categorical arrays.
  *
  * @param reportName Report stanza to read (None = first, sorted)
  */
class BlueConfigAdapter(
    reportName: Option[String] = None,
    nodeSliceBytes: Long = SonataAdapter.NodeSliceBytes) extends DataAdapter {

  // ---- config resolution --------------------------------------------------

  private def configFile(simulationPath: String): Path = {
    val p = Paths.get(simulationPath)
    if (Files.isDirectory(p)) p.resolve("BlueConfig") else p
  }

  private def runEntries(cfgPath: Path): Map[String, String] =
    BlueConfig.parse(cfgPath.toString)
      .find(_.kind == "Run").map(_.entries).getOrElse(Map.empty)

  private def resolve(cfgPath: Path, raw: String): Path = {
    val p = Paths.get(raw)
    (if (p.isAbsolute) p else cfgPath.getParent.resolve(raw)).normalize()
  }

  private def outputRoot(cfgPath: Path): Path =
    resolve(cfgPath, runEntries(cfgPath).getOrElse("OutputRoot", "."))

  /** out.dat when present (the classic NEURON text format), else the
    * SONATA out.h5 — mirroring bluepy's spike_report_path resolution.
    */
  private[engine] def spikesFile(simulationPath: String): Path = {
    val out = outputRoot(configFile(simulationPath))
    val dat = out.resolve("out.dat")
    if (Files.exists(dat)) dat else out.resolve("out.h5")
  }

  private[engine] def reportFile(simulationPath: String): Path = {
    val cfgPath = configFile(simulationPath)
    val reports = BlueConfig.parse(cfgPath.toString).filter(_.kind == "Report")
    val name = reportName.orElse(reports.map(_.name).sorted.headOption).getOrElse(
      throw new IllegalArgumentException(s"$simulationPath: no Report stanzas"))
    outputRoot(cfgPath).resolve(s"$name.h5")
  }

  // ---- status -------------------------------------------------------------

  /** bluepy is_complete: the spike report path resolves
    * (adapters/impl/bluepy/simulation.py:75-82).
    */
  override def isComplete(simulationPath: String): Boolean =
    try {
      val f = spikesFile(simulationPath)
      Files.exists(f) && Files.size(f) > 0
    } catch { case _: Exception => false }

  // ---- spikes -------------------------------------------------------------

  /** (time, gid) with 1-based bluepy GIDs: SONATA `out.h5` node_ids get
    * +1 (bluepy GID = SONATA node_id + 1); `out.dat` rows ("time gid"
    * after the `/scatter` header) already carry GIDs.
    */
  def spikes(spark: SparkSession, simulationPath: String): DataFrame = {
    val f = spikesFile(simulationPath)
    if (f.getFileName.toString.endsWith(".dat")) {
      // distributed text scan; header and blank lines dropped map-side
      spark.read.text(f.toString)
        .select(split(trim(col("value")), "\\s+").as("t"))
        .filter(size(col("t")) === 2 && col("t").getItem(0).cast("double").isNotNull)
        .select(
          col("t").getItem(0).cast("double").as("time"),
          col("t").getItem(1).cast("long").as("gid"))
    } else
      spark.read.format("sonata-spikes").load(f.toString)
        .select(col("time"), (col("gid") + 1L).as("gid"))
  }

  // ---- frame reports ------------------------------------------------------

  /** Long form of the legacy report through `sonata-frames` (the source
    * auto-detects the flat layout): (time, gid, value), plus `section`
    * for genuine compartment reports (more columns than gids, or any
    * nonzero element_id) — the same shape rule as the SONATA tier.
    */
  def frames(spark: SparkSession, simulationPath: String): DataFrame = {
    val file = reportFile(simulationPath).toString
    val h5 = new Hdf5File(file)
    val hasSections =
      try {
        val nGids = h5.dims("/mapping/gids").product
        h5.dims("/data")(1) != nGids ||
          (h5.exists("/mapping/element_id") &&
            h5.readLongs("/mapping/element_id").exists(_ != 0))
      } finally h5.close()
    val cols = Seq("time", "gid", "value") ++ (if (hasSections) Seq("section") else Nil)
    spark.read.format("sonata-frames").load(file).select(cols.map(col): _*)
  }

  // ---- node tables --------------------------------------------------------

  /** MVD3 cell table → one row per cell: `gid` (1-based), `x`/`y`/`z`
    * from `/cells/positions`, and every `/cells/properties/<name>` column —
    * enumeration indices resolved through `/library/<prop>` (mtype,
    * etype, morphology, …), plain integers (layer, hypercolumn, …) kept
    * as long. What bluepy's CellCollection.get() materializes.
    *
    * Accepts an .mvd3 path, a CircuitConfig/BlueConfig file (resolves
    * `CellLibraryFile` relative to it), or a directory holding
    * `CircuitConfig`.
    */
  def nodes(spark: SparkSession, circuitPath: String): DataFrame = {
    val mvdFile =
      if (circuitPath.endsWith(".mvd3")) Paths.get(circuitPath)
      else {
        val p = Paths.get(circuitPath)
        val cfgPath = if (Files.isDirectory(p)) p.resolve("CircuitConfig") else p
        val lib = runEntries(cfgPath).getOrElse("CellLibraryFile",
          throw new IllegalArgumentException(s"$circuitPath: no CellLibraryFile"))
        resolve(cfgPath, lib)
      }
    val path = mvdFile.toString
    import SonataAdapter._
    val h5 = new Hdf5File(path)
    val (n, specs): (Long, Seq[NodeProp]) =
      try {
        val props = h5.ls("/cells/properties").map(c => c -> s"/cells/properties/$c")
        require(props.nonEmpty, s"$path: no /cells/properties")
        val n = h5.dims(props.head._2).product
        val specs = props.map { case (name, dsPath) =>
          val lib =
            if (h5.exists(s"/library/$name")) Some(h5.readStrings(s"/library/$name"))
            else None
          NodeProp(name, dsPath, if (lib.isDefined) LibProp else LongProp, lib)
        }
        (n, specs)
      } finally h5.close()
    val schema = org.apache.spark.sql.types.StructType(
      Seq(
        org.apache.spark.sql.types.StructField("gid",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("y",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("z",
          org.apache.spark.sql.types.DoubleType)) ++
        specs.map(s =>
          org.apache.spark.sql.types.StructField(s.column, s.kind match {
            case LibProp => org.apache.spark.sql.types.StringType
            case _ => org.apache.spark.sql.types.LongType
          })))
    val rowsPerSlice = math.max(1L, nodeSliceBytes / math.max(1, (specs.size + 3) * 8))
    val slices = (0L until n by rowsPerSlice)
      .map(s => (s, math.min(s + rowsPerSlice, n)))
    val rdd = spark.sparkContext
      .parallelize(slices, slices.size.max(1))
      .flatMap { case (r0, r1) =>
        val f = new Hdf5File(path)
        try {
          val pos = f.readDoubles("/cells/positions", r0 * 3, r1 * 3)
          val cols: Seq[Array[_]] = specs.map { s =>
            s.kind match {
              case LibProp =>
                val lib = s.lib.get
                f.readLongs(s.dsPath, r0, r1).map(i => lib(i.toInt))
              case _ => f.readLongs(s.dsPath, r0, r1)
            }
          }
          (r0 until r1).map { i =>
            val o = (i - r0).toInt
            org.apache.spark.sql.Row.fromSeq(
              (i + 1) +: pos(o * 3) +: pos(o * 3 + 1) +: pos(o * 3 + 2) +:
                cols.map(_(o)))
          }
        } finally f.close()
      }
    spark.createDataFrame(rdd, schema).withColumn("population", lit("default"))
  }

  // ---- targets ------------------------------------------------------------

  /** Resolved targets of a simulation: `CircuitPath/start.target` plus
    * the Run stanza's `TargetFile` (user targets win on name clash) —
    * the node-sets equivalent of this tier.
    */
  def targets(simulationPath: String): Map[String, Seq[Long]] = {
    val cfgPath = configFile(simulationPath)
    val run = runEntries(cfgPath)
    val start = run.get("CircuitPath")
      .map(cp => resolve(cfgPath, cp).resolve("start.target"))
      .filter(Files.exists(_)).map(p => BlueConfig.targets(p.toString))
      .getOrElse(Map.empty)
    val user = run.get("TargetFile")
      .map(tf => resolve(cfgPath, tf)).filter(Files.exists(_))
      .map(p => BlueConfig.targets(p.toString)).getOrElse(Map.empty)
    start ++ user
  }
}
