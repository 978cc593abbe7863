package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** DataSource V2 reader for SONATA HDF5 spike reports — the native format
  * the reference reads through bluepysnap
  * (adapters/impl/bluepysnap/simulation.py:36-38; file layout
  * `/spikes/<population>/{timestamps, node_ids}` with a `sorting`
  * attribute, written by convert_spikes.py:133-145 and by the simulators).
  * Built on [[Hdf5File]], no native HDF5 library.
  *
  * Scale design (one .h5 spike report can be many GB):
  *  - each population's row space splits into fixed-size row-range
  *    partitions; an executor task reads ONLY its contiguous byte slice of
  *    the timestamps/node_ids datasets (positional reads, no full-file
  *    materialization anywhere);
  *  - **time-range pushdown uses the SONATA sort order**: when a
  *    population is `sorting=by_time` (the converter's own output), pushed
  *    `time` bounds binary-search the timestamps dataset at plan time and
  *    the partition row ranges collapse to the matching window — a
  *    `t ∈ [a,b)` probe of a year-long report reads only that window's
  *    bytes, the same effect parquet row-group pruning gives the converted
  *    path;
  *  - `population` equality filters prune whole populations at planning;
  *    gid/time predicates are additionally evaluated in the reader so
  *    non-matching rows never become InternalRows;
  *  - column pruning decodes only the requested columns.
  *
  * Usage: `spark.read.format("sonata-spikes").load("out/spikes.h5")`
  * (options: `population` to restrict, `rowsPerPartition`).
  */
class SonataSpikesSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "sonata-spikes"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SonataSpikesSource.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new SonataSpikesTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object SonataSpikesSource {
  val schema: StructType = StructType(Seq(
    StructField("population", StringType),
    StructField("time", DoubleType),
    StructField("gid", LongType)))

  /** 2M rows ≈ 32 MB of (f64 + i64) per task. */
  val DefaultRowsPerPartition: Long = 2L * 1024 * 1024

  /** SONATA sorting enum (convert_spikes.py:136): none=0, by_id=1, by_time=2. */
  val SortedByTime = 2.0

  /** Populations of a spikes file: named groups under /spikes, or the
    * legacy layout with datasets directly under /spikes (population "").
    */
  def populations(h5: Hdf5File): Seq[String] = {
    val children = h5.ls("/spikes")
    if (children.contains("timestamps")) Seq("")
    else children
  }

  def popPath(pop: String): String = if (pop.isEmpty) "/spikes" else s"/spikes/$pop"

  /** First row index with timestamps(row) >= t (dataset sorted by time). */
  def lowerBound(h5: Hdf5File, ds: String, n: Long, t: Double): Long = {
    var lo = 0L; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (h5.readDoubles(ds, mid, mid + 1)(0) < t) lo = mid + 1 else hi = mid
    }
    lo
  }

  private[sources] def supported(f: Filter): Boolean = {
    def isCol(a: String) = a == "time" || a == "gid" || a == "population"
    f match {
      case EqualTo(a, v) => isCol(a) && v != null
      case GreaterThan(a, v) => isCol(a) && v != null
      case GreaterThanOrEqual(a, v) => isCol(a) && v != null
      case LessThan(a, v) => isCol(a) && v != null
      case LessThanOrEqual(a, v) => isCol(a) && v != null
      case In(a, vs) => isCol(a) && vs != null && !vs.contains(null)
      case IsNotNull(a) => isCol(a)
      case And(l, r) => supported(l) && supported(r)
      case _ => false // Or/Not stay residual: range extraction would be unsound
    }
  }

  /** Conservative [lo, hi) time window implied by the pushed filters:
    * only top-level / And-ed conjuncts narrow the window.
    */
  private[sources] def timeWindow(filters: Seq[Filter]): (Double, Double) = {
    var lo = Double.NegativeInfinity
    var hi = Double.PositiveInfinity
    def visit(f: Filter): Unit = f match {
      case GreaterThan("time", n: Number) => lo = math.max(lo, n.doubleValue())
      case GreaterThanOrEqual("time", n: Number) => lo = math.max(lo, n.doubleValue())
      case LessThan("time", n: Number) => hi = math.min(hi, n.doubleValue())
      case LessThanOrEqual("time", n: Number) =>
        hi = math.min(hi, math.nextUp(n.doubleValue()))
      case EqualTo("time", n: Number) =>
        lo = math.max(lo, n.doubleValue()); hi = math.min(hi, math.nextUp(n.doubleValue()))
      case And(l, r) => visit(l); visit(r)
      case _ => ()
    }
    filters.foreach(visit)
    (lo, hi)
  }

  /** Population names admitted by the pushed filters (None = all). */
  private[sources] def popFilter(filters: Seq[Filter]): Option[Set[String]] = {
    var sets = List.empty[Set[String]]
    def visit(f: Filter): Unit = f match {
      case EqualTo("population", s: String) => sets ::= Set(s)
      case In("population", vs) => sets ::= vs.collect { case s: String => s }.toSet
      case And(l, r) => visit(l); visit(r)
      case _ => ()
    }
    filters.foreach(visit)
    sets.reduceOption(_ intersect _)
  }

  private[sources] def eval(f: Filter, pop: String, time: Double, gid: Long): Boolean = {
    def cmp(attr: String, v: Any): Option[Int] = (attr, v) match {
      case (_, null) => None
      case ("time", n: Number) => Some(java.lang.Double.compare(time, n.doubleValue()))
      case ("gid", n: Number) => Some(java.lang.Long.compare(gid, n.longValue()))
      case ("population", s: String) => Some(pop.compareTo(s))
      case _ => None
    }
    f match {
      case EqualTo(a, v) => cmp(a, v).contains(0)
      case GreaterThan(a, v) => cmp(a, v).exists(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp(a, v).exists(_ >= 0)
      case LessThan(a, v) => cmp(a, v).exists(_ < 0)
      case LessThanOrEqual(a, v) => cmp(a, v).exists(_ <= 0)
      case In(a, vs) => vs.exists(v => cmp(a, v).contains(0))
      case IsNotNull(_) => true
      case And(l, r) => eval(l, pop, time, gid) && eval(r, pop, time, gid)
      case _ => true
    }
  }
}

class SonataSpikesTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"sonata_spikes($path)"
  override def schema(): StructType = SonataSpikesSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SonataScanBuilder(
      path,
      Option(options.get("population")),
      Option(options.get("rowsperpartition")).map(_.toLong)
        .getOrElse(SonataSpikesSource.DefaultRowsPerPartition))
}

class SonataScanBuilder(path: String, population: Option[String], rowsPerPartition: Long)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SonataSpikesSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition(SonataSpikesSource.supported)
    pushed = ours
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new SonataScan(path, population, rowsPerPartition, pushed, required)
}

/** Row range [start, end) of one population's spike datasets. */
final case class SonataRowRange(file: String, pop: String, start: Long, end: Long)
    extends InputPartition

class SonataScan(
    path: String, population: Option[String], rowsPerPartition: Long,
    filters: Array[Filter], required: StructType) extends Scan with Batch {
  import SonataSpikesSource._

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SonataSpikesScan pushed=[${filters.mkString(",")}] cols=[${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val h5 = new Hdf5File(path)
    try {
      val admitted = popFilter(filters.toSeq)
      val pops = populations(h5)
        .filter(p => population.forall(_ == p))
        .filter(p => admitted.forall(_.contains(p)))
      val (tLo, tHi) = timeWindow(filters.toSeq)
      pops.flatMap { pop =>
        val ts = s"${popPath(pop)}/timestamps"
        val n = h5.dims(ts).product
        // by_time sort (the SONATA converter's own output) turns pushed
        // time bounds into a row window via binary search at PLAN time
        val byTime = h5.attr(popPath(pop), "sorting").contains(SortedByTime)
        val (lo, hi) =
          if (byTime && (tLo > Double.NegativeInfinity || tHi < Double.PositiveInfinity))
            (if (tLo > Double.NegativeInfinity) lowerBound(h5, ts, n, tLo) else 0L,
              if (tHi < Double.PositiveInfinity) lowerBound(h5, ts, n, tHi) else n)
          else (0L, n)
        (lo until hi by rowsPerPartition).map(s =>
          SonataRowRange(path, pop, s, math.min(s + rowsPerPartition, hi)): InputPartition)
      }.toArray
    } finally h5.close()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SonataReaderFactory(filters, required)
}

class SonataReaderFactory(filters: Array[Filter], required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SonataRangeReader(partition.asInstanceOf[SonataRowRange], filters, required)
}

/** Reads one contiguous row range of one population — two positional byte
  * slices (timestamps + node_ids), decoded straight into primitive arrays.
  */
class SonataRangeReader(p: SonataRowRange, filters: Array[Filter], required: StructType)
    extends PartitionReader[InternalRow] {
  import SonataSpikesSource._

  private val h5 = new Hdf5File(p.file)
  private val needTime = required.fieldNames.contains("time")
  private val needGid = required.fieldNames.contains("gid")
  private val n = (p.end - p.start).toInt
  // decode only the referenced datasets (times also needed when a pushed
  // time filter must be evaluated, same for gid)
  private val filterCols = filters.flatMap(_.references).toSet
  private val times: Array[Double] =
    if (needTime || filterCols("time"))
      h5.readDoubles(s"${popPath(p.pop)}/timestamps", p.start, p.end)
    else null
  private val gids: Array[Long] =
    if (needGid || filterCols("gid"))
      h5.readLongs(s"${popPath(p.pop)}/node_ids", p.start, p.end)
    else null
  private val popUtf8 = UTF8String.fromString(p.pop)

  private var i = -1
  override def next(): Boolean = {
    i += 1
    while (i < n && !filters.forall(
        eval(_, p.pop, if (times ne null) times(i) else 0.0,
          if (gids ne null) gids(i) else 0L))) i += 1
    i < n
  }

  override def get(): InternalRow =
    InternalRow.fromSeq(required.fieldNames.toSeq.map {
      case "population" => popUtf8
      case "time" => times(i)
      case "gid" => gids(i)
    })

  override def close(): Unit = h5.close()
}
