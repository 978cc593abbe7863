package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** DataSource V2 reader for whitespace/comma-separated spike files —
  * the custom-source tier of the design (SURVEY §2.1 S2: a native
  * report-format reader needs a DSv2 source implementing pushdown; the
  * container has no HDF5 libs, so the text spike format the reference's
  * converter consumes — convert_spikes.py:94-107, `times/timestamps` +
  * `ids/node_ids` header aliases — stands in as the native format).
  *
  * Demonstrated capabilities:
  *  - `SupportsPushDownFilters`: eq/compare/in predicates on `time`/`gid`
  *    are evaluated inside the reader while parsing, so filtered rows
  *    never materialize (shows under `PushedFilters` in explain);
  *  - `SupportsPushDownRequiredColumns`: only requested columns are
  *    decoded into rows;
  *  - one `InputPartition` per file — a directory of spike files scans in
  *    parallel across executors.
  *
  * Usage: `spark.read.format("graft.sources.SpikesCsvSource").load(path)`.
  */
class SpikesCsvSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "spikes-csv"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SpikesCsvSource.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new SpikesTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object SpikesCsvSource {
  val schema: StructType = StructType(Seq(
    StructField("time", DoubleType), StructField("gid", LongType)))

  private[sources] val TimeAliases = Set("time", "times", "timestamps", "t")
  private[sources] val GidAliases = Set("gid", "ids", "node_ids", "id")

  private[sources] def listFiles(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles().filter(_.isFile).map(_.getPath).toSeq.sorted
    else Seq(path)
  }

  /** Evaluate a pushed filter against a parsed (time, gid) row. gid is
    * compared in Long (a Double round-trip loses precision above 2^53);
    * null values never reach here — `supported` rejects them.
    */
  private[sources] def eval(f: Filter, time: Double, gid: Long): Boolean = {
    def cmp(attr: String, v: Any): Option[Int] = (attr, v) match {
      case (_, null) => None
      case ("time", n: Number) => Some(java.lang.Double.compare(time, n.doubleValue()))
      case ("time", other) =>
        scala.util.Try(other.toString.toDouble).toOption
          .map(java.lang.Double.compare(time, _))
      case ("gid", n @ (_: java.lang.Long | _: java.lang.Integer |
                        _: java.lang.Short | _: java.lang.Byte)) =>
        Some(java.lang.Long.compare(gid, n.asInstanceOf[Number].longValue()))
      case ("gid", n: Number) =>
        scala.util.Try(BigDecimal(n.toString)).toOption.map(BigDecimal(gid).compare(_))
      case ("gid", other) =>
        scala.util.Try(other.toString.toLong).toOption
          .map(java.lang.Long.compare(gid, _))
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
      case And(l, r) => eval(l, time, gid) && eval(r, time, gid)
      case Or(l, r) => eval(l, time, gid) || eval(r, time, gid)
      case Not(c) => !eval(c, time, gid)
      case _ => true // unsupported filters are not pushed (see pushFilters)
    }
  }

  private[sources] def supported(f: Filter): Boolean = {
    def isCol(a: String) = a == "time" || a == "gid"
    f match {
      // null comparison values stay residual: Spark's three-valued NULL
      // semantics don't survive the boolean eval above (esp. under Not)
      case EqualTo(a, v) => isCol(a) && v != null
      case GreaterThan(a, v) => isCol(a) && v != null
      case GreaterThanOrEqual(a, v) => isCol(a) && v != null
      case LessThan(a, v) => isCol(a) && v != null
      case LessThanOrEqual(a, v) => isCol(a) && v != null
      case In(a, vs) => isCol(a) && vs != null && !vs.contains(null)
      case IsNotNull(a) => isCol(a)
      case And(l, r) => supported(l) && supported(r)
      case Or(l, r) => supported(l) && supported(r)
      case Not(c) => supported(c)
      case _ => false
    }
  }
}

class SpikesTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"spikes_csv($path)"
  override def schema(): StructType = SpikesCsvSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SpikesScanBuilder(path)
}

class SpikesScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SpikesCsvSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition(SpikesCsvSource.supported)
    pushed = ours
    rest // residual filters Spark must still evaluate
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SpikesScan(path, pushed, required)
}

class SpikesScan(path: String, filters: Array[Filter], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SpikesCsvScan pushed=[${filters.mkString(",")}] cols=[${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] =
    SpikesCsvSource.listFiles(path).map(f => SpikesFilePartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new SpikesReaderFactory(filters, required)
}

final case class SpikesFilePartition(file: String) extends InputPartition

class SpikesReaderFactory(filters: Array[Filter], required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SpikesFileReader(partition.asInstanceOf[SpikesFilePartition].file, filters, required)
}

/** Streams one file; parses the header to locate the time/gid columns via
  * the reference's alias sets; applies pushed filters during the scan so
  * non-matching lines never become rows.
  */
class SpikesFileReader(file: String, filters: Array[Filter], required: StructType)
    extends PartitionReader[InternalRow] {

  private val reader = new java.io.BufferedReader(new java.io.FileReader(file))
  private val sep = "[,\\s]+"
  private val (timeIdx, gidIdx) = {
    val header = Option(reader.readLine()).getOrElse("")
    val cols = header.trim.split(sep).map(_.toLowerCase)
    val t = cols.indexWhere(SpikesCsvSource.TimeAliases)
    val g = cols.indexWhere(SpikesCsvSource.GidAliases)
    require(t >= 0 && g >= 0, s"no time/gid header in $file: '$header'")
    (t, g)
  }
  private val emitTime = required.fieldNames.contains("time")
  private val emitGid = required.fieldNames.contains("gid")
  private var current: InternalRow = _

  // Malformed / comment data lines are skipped, not fatal: one bad line in
  // a multi-GB report must not kill the whole scan.
  private def parseable(parts: Array[String]): Boolean =
    try { parts(timeIdx).toDouble; parts(gidIdx).toLong; true }
    catch { case _: NumberFormatException => false }

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null) {
      val trimmed = line.trim
      val parts = trimmed.split(sep)
      if (!trimmed.startsWith("#") && !trimmed.startsWith("//") &&
          parts.length > math.max(timeIdx, gidIdx) && parts.exists(_.nonEmpty) &&
          parseable(parts)) {
        val time = parts(timeIdx).toDouble
        val gid = parts(gidIdx).toLong
        if (filters.forall(SpikesCsvSource.eval(_, time, gid))) {
          val values = required.fieldNames.map {
            case "time" => java.lang.Double.valueOf(time)
            case "gid" => java.lang.Long.valueOf(gid)
          }
          current = InternalRow.fromSeq(values.toSeq)
          return true
        }
      }
      line = reader.readLine()
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
