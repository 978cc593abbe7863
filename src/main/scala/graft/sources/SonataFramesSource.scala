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

/** DataSource V2 reader for SONATA HDF5 frame reports (soma/compartment
  * voltage traces) — layout `/report/<pop>/{data, mapping/{node_ids,
  * index_pointers, element_ids, time}}` where `data` is an
  * [n_frames × n_columns] float32 matrix and `mapping/time` is the
  * implicit grid `(start, stop, step)`. The reference reads these through
  * bluepysnap with `t_start/t_stop/t_step` pushed into the reader
  * (adapters/impl/bluepysnap/simulation.py:42-60); this source gives
  * Catalyst the same power at plan time.
  *
  * Scale design (a frame report is the BIG table of a campaign — hours ×
  * kHz × millions of columns):
  *  - **time-window pushdown uses the implicit grid**: frame row r holds
  *    t = start + r·step, so pushed `time` bounds collapse the planned
  *    row ranges to `[⌊(lo−start)/step⌋, ⌈(hi−start)/step⌉)` with a
  *    one-row conservative margin — a narrow probe of a long report plans
  *    (and reads) only that window's slabs; residual evaluation in the
  *    reader keeps boundary semantics exact regardless of float rounding;
  *  - **gid pushdown prunes columns**: `gid = k` / `gid IN (...)`
  *    conjuncts map to column runs via node_ids/index_pointers; when the
  *    admitted runs are narrow (≤ 1/4 of columns) each task reads only
  *    those byte runs of each frame row instead of whole rows;
  *  - each task reads a contiguous frame-row slab (positional reads, no
  *    full-matrix materialization) and streams rows out — nothing is
  *    buffered beyond one ~4 MB slab;
  *  - `population` equality prunes whole populations at planning; column
  *    pruning skips decoding `data` entirely for row-count-only plans.
  *
  * Usage: `spark.read.format("sonata-frames").load("out/soma.h5")`
  * (options: `population`, `slicebytes`).
  */
class SonataFramesSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "sonata-frames"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SonataFramesSource.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new SonataFramesTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object SonataFramesSource {
  val schema: StructType = StructType(Seq(
    StructField("population", StringType),
    StructField("time", DoubleType),
    StructField("gid", LongType),
    StructField("value", DoubleType),
    StructField("section", LongType)))

  /** Target bytes of `data` per planned slice (one task's working set). */
  val DefaultSliceBytes: Long = 4L * 1024 * 1024

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

  /** gid values admitted by top-level / And-ed EqualTo/In conjuncts
    * (None = unconstrained).
    */
  private[sources] def gidFilter(filters: Seq[Filter]): Option[Set[Long]] = {
    var sets = List.empty[Set[Long]]
    def visit(f: Filter): Unit = f match {
      case EqualTo("gid", n: Number) => sets ::= Set(n.longValue())
      case In("gid", vs) => sets ::= vs.collect { case n: Number => n.longValue() }.toSet
      case And(l, r) => visit(l); visit(r)
      case _ => ()
    }
    filters.foreach(visit)
    sets.reduceOption(_ intersect _)
  }

  /** Merge sorted [start, end) column runs that touch. */
  private[sources] def mergeRuns(runs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    runs.sortBy(_._1).foldLeft(List.empty[(Long, Long)]) {
      case ((s, e) :: tail, (s2, e2)) if s2 <= e => (s, math.max(e, e2)) :: tail
      case (acc, r) => r :: acc
    }.reverse

  private[sources] def eval(f: Filter, pop: String, time: Double, gid: Long): Boolean =
    SonataSpikesSource.eval(f, pop, time, gid)

  /** Resolved dataset paths of one population's frame report. Two on-disk
    * layouts map onto the same plan: the SONATA layout
    * (`/report/<pop>/{data, mapping/{node_ids, index_pointers,
    * element_ids, time}}`) and the legacy BBP flat layout written by
    * pre-SONATA report writers and read by bluepy
    * (`/data` + `/mapping/{gids, index_pointer, element_id, time}` at the
    * root, no population level — reference reaches it through
    * bluepy.impl.compartment_report via adapters/impl/bluepy/
    * simulation.py:39-51). Legacy reports surface as population
    * "default"; both keep the implicit time grid `(start, stop, step)`.
    */
  private[sources] final case class FramesLayout(
      pop: String, data: String, nodeIds: String,
      indexPointers: Option[String], elementIds: Option[String], time: String)

  private[sources] def layouts(h5: Hdf5File): Seq[FramesLayout] =
    if (h5.exists("/report"))
      h5.ls("/report").map { p =>
        val m = s"/report/$p/mapping"
        FramesLayout(p, s"/report/$p/data", s"$m/node_ids",
          Some(s"$m/index_pointers").filter(h5.exists),
          Some(s"$m/element_ids").filter(h5.exists), s"$m/time")
      }
    else if (h5.exists("/data") && h5.exists("/mapping/gids"))
      Seq(FramesLayout("default", "/data", "/mapping/gids",
        Some("/mapping/index_pointer").filter(h5.exists),
        Some("/mapping/element_id").filter(h5.exists), "/mapping/time"))
    else throw new IllegalArgumentException(
      "not a frame report: neither /report/<pop> (SONATA) nor /data + " +
        "/mapping/gids (legacy BBP) present")

  /** Column-start offsets normalized to nGids+1 entries: SONATA
    * index_pointers already carry the closing offset; legacy
    * index_pointer holds starts only (run k ends at the next start, the
    * last at nCols); absent → one column per gid.
    */
  private[sources] def colStarts(
      idx: Option[Array[Long]], nGids: Int, nCols: Long): Array[Long] =
    idx match {
      case Some(a) if a.length == nGids + 1 => a
      case Some(a) if a.length == nGids => a :+ nCols
      case Some(a) => throw new IllegalArgumentException(
        s"index pointer length ${a.length} matches neither $nGids nor ${nGids + 1}")
      case None => Array.tabulate(nGids + 1)(_.toLong)
    }
}

class SonataFramesTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"sonata_frames($path)"
  override def schema(): StructType = SonataFramesSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SonataFramesScanBuilder(
      path,
      Option(options.get("population")),
      Option(options.get("slicebytes")).map(_.toLong)
        .getOrElse(SonataFramesSource.DefaultSliceBytes),
      Option(options.get("colpruneratio")).map(_.toInt).getOrElse(4))
}

class SonataFramesScanBuilder(
    path: String, population: Option[String], sliceBytes: Long, colPruneRatio: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SonataFramesSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition(SonataFramesSource.supported)
    pushed = ours
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan =
    new SonataFramesScan(path, population, sliceBytes, colPruneRatio, pushed, required)
}

/** Frame-row range [r0, r1) of one population's data matrix, optionally
  * restricted to the given column runs (gid pushdown).
  */
final case class SonataFrameSlice(
    file: String, pop: String, r0: Long, r1: Long,
    runs: Option[Seq[(Long, Long)]]) extends InputPartition

class SonataFramesScan(
    path: String, population: Option[String], sliceBytes: Long, colPruneRatio: Int,
    filters: Array[Filter], required: StructType) extends Scan with Batch {
  import SonataFramesSource._

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SonataFramesScan pushed=[${filters.mkString(",")}] cols=[${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val h5 = new Hdf5File(path)
    try {
      val admitted = SonataSpikesSource.popFilter(filters.toSeq)
      val pops = layouts(h5)
        .filter(l => population.forall(_ == l.pop))
        .filter(l => admitted.forall(_.contains(l.pop)))
      val (tLo, tHi) = SonataSpikesSource.timeWindow(filters.toSeq)
      val gids = gidFilter(filters.toSeq)
      pops.flatMap { layout =>
        val pop = layout.pop
        val dims = h5.dims(layout.data)
        val (nFrames, nCols) = (dims(0), dims(1))
        val Array(start, _, step) = h5.readDoubles(layout.time)
        // pushed time bounds → frame-row range via the implicit grid, with
        // a one-row margin each side; reader-side residual eval keeps the
        // boundary exact, so the bounds only need to be conservative
        val (rLo, rHi) =
          if (step > 0 && (tLo > Double.NegativeInfinity || tHi < Double.PositiveInfinity)) {
            val lo =
              if (tLo > Double.NegativeInfinity)
                math.max(0L, math.floor((tLo - start) / step).toLong)
              else 0L
            val hi =
              if (tHi < Double.PositiveInfinity)
                math.min(nFrames, math.ceil((tHi - start) / step).toLong + 1)
              else nFrames
            (lo, math.max(lo, hi))
          } else (0L, nFrames)
        // pushed gid equality/In → column runs; only worth the per-row
        // positional reads when the admitted width is a small fraction
        val runs: Option[Seq[(Long, Long)]] = gids.map { admit =>
          val nodeIds = h5.readLongs(layout.nodeIds)
          val idx = colStarts(
            layout.indexPointers.map(h5.readLongs(_)), nodeIds.length, nCols)
          mergeRuns(nodeIds.indices.collect {
            case k if admit.contains(nodeIds(k)) => (idx(k), idx(k + 1))
          }.toSeq)
        }.flatMap { rs =>
          val width = rs.map { case (s, e) => e - s }.sum
          if (rs.isEmpty) Some(Nil) // gid filter admits nothing → no rows
          else if (width * colPruneRatio <= nCols) Some(rs)
          else None // wide selection: whole-row slabs are cheaper
        }
        if (runs.contains(Nil)) Nil
        else {
          val es = h5.elemSize(layout.data)
          val bytesPerRow =
            runs.map(_.map { case (s, e) => e - s }.sum).getOrElse(nCols) * es
          val rowsPerSlice = math.max(1L, sliceBytes / math.max(1L, bytesPerRow))
          (rLo until rHi by rowsPerSlice).map(s =>
            SonataFrameSlice(path, pop, s, math.min(s + rowsPerSlice, rHi), runs)
              : InputPartition)
        }
      }.toArray
    } finally h5.close()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SonataFramesReaderFactory(filters, required)
}

class SonataFramesReaderFactory(filters: Array[Filter], required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SonataFramesReader(partition.asInstanceOf[SonataFrameSlice], filters, required)
}

/** Streams one frame-row slab: per batch of rows it issues one positional
  * read (whole rows) or one read per column run per row (gid-pruned), and
  * yields rows lazily — no slab-sized tuple buffer ever materializes.
  */
class SonataFramesReader(p: SonataFrameSlice, filters: Array[Filter], required: StructType)
    extends PartitionReader[InternalRow] {
  import SonataFramesSource._

  private val h5 = new Hdf5File(p.file)
  private val layout = layouts(h5).find(_.pop == p.pop).getOrElse(
    throw new IllegalStateException(s"population ${p.pop} vanished from ${p.file}"))
  private val dims = h5.dims(layout.data)
  private val nCols = dims(1).toInt
  private val Array(tStart, _, tStep) = h5.readDoubles(layout.time)

  private val need = required.fieldNames.toSet
  private val filterCols = filters.flatMap(_.references).toSet
  private val needValue = need("value")
  private val needGid = need("gid") || filterCols("gid")
  private val needSection = need("section")

  // column → owning gid / section id, expanded once per task (O(nCols);
  // the data matrix is O(nFrames × nCols) — metadata stays the small side)
  private val (colNode, colElem): (Array[Long], Array[Long]) =
    if (needGid || needSection) {
      val nodeIds = h5.readLongs(layout.nodeIds)
      val idx = colStarts(
        layout.indexPointers.map(h5.readLongs(_)), nodeIds.length, nCols)
      val cn = new Array[Long](nCols)
      var k = 0
      while (k < nodeIds.length) {
        var j = idx(k)
        while (j < idx(k + 1)) { cn(j.toInt) = nodeIds(k); j += 1 }
        k += 1
      }
      val ce =
        if (needSection && layout.elementIds.isDefined)
          h5.readLongs(layout.elementIds.get)
        else new Array[Long](nCols)
      (cn, ce)
    } else (null, null)

  private val cols: Array[Long] = p.runs match {
    case Some(rs) => rs.iterator.flatMap { case (s, e) => s until e }.toArray
    case None => Array.tabulate(nCols)(_.toLong)
  }
  private val popUtf8 = UTF8String.fromString(p.pop)

  // batches of whole rows; within a batch one read per run (or one slab)
  private val rowsPerBatch: Int =
    math.max(1, (DefaultSliceBytes / math.max(1, cols.length * 8)).toInt)

  // Hot-path prep, once per reader (this is the BIG table — hours × kHz ×
  // millions of columns; nothing name-based may run per row):
  //  - required fields resolve to an ordinal code array;
  //  - residual filters split into row-level (time/population only,
  //    evaluated once per frame row) and gid-level (once per column);
  //  - one GenericInternalRow is reused across emits (downstream copies
  //    when it buffers, per the DSv2 row-reader contract).
  private val ords: Array[Int] = required.fieldNames.map {
    case "population" => 0
    case "time" => 1
    case "gid" => 2
    case "value" => 3
    case "section" => 4
  }
  private val rowFilters: Array[Filter] = filters.filterNot(_.references.contains("gid"))
  private val gidFilters: Array[Filter] = filters.filter(_.references.contains("gid"))
  private val reuse = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(ords.length)

  private val width = cols.length
  private var r: Long = p.r0
  private var ci: Int = 0
  private var batchStart: Long = p.r0
  private var batchEnd: Long = p.r0 // exclusive end of the loaded batch
  private var vals: Array[Double] = null
  private var t: Double = 0.0
  private var rowOk: Boolean = false
  private var rowEntered: Boolean = false

  /** Positional-read values for rows [batchStart, batchEnd) at the
    * selected columns, row-major — one read per run (or one whole slab).
    */
  private def loadBatch(): Unit = {
    batchStart = r
    batchEnd = math.min(r + rowsPerBatch, p.r1)
    vals =
      if (!needValue) null
      else p.runs match {
        case None => h5.readDoubles(layout.data, batchStart * nCols, batchEnd * nCols)
        case Some(rs) =>
          val out = new Array[Double]((batchEnd - batchStart).toInt * width)
          var rr = batchStart
          while (rr < batchEnd) {
            var o = (rr - batchStart).toInt * width
            rs.foreach { case (c0, c1) =>
              val run = h5.readDoubles(layout.data, rr * nCols + c0, rr * nCols + c1)
              System.arraycopy(run, 0, out, o, run.length)
              o += run.length
            }
            rr += 1
          }
          out
      }
  }

  override def next(): Boolean = {
    while (r < p.r1) {
      if (r >= batchEnd) loadBatch()
      if (!rowEntered) {
        t = tStart + r * tStep
        var i = 0
        rowOk = true
        while (rowOk && i < rowFilters.length) {
          rowOk = eval(rowFilters(i), p.pop, t, 0L); i += 1
        }
        rowEntered = true
        ci = 0
      }
      if (!rowOk || ci >= width) { r += 1; rowEntered = false }
      else {
        val c = cols(ci).toInt
        val gid = if (colNode ne null) colNode(c) else 0L
        var pass = true
        var i = 0
        while (pass && i < gidFilters.length) {
          pass = eval(gidFilters(i), p.pop, t, gid); i += 1
        }
        if (pass) {
          i = 0
          while (i < ords.length) {
            val v: Any = ords(i) match {
              case 0 => popUtf8
              case 1 => t
              case 2 => gid
              case 3 => vals((r - batchStart).toInt * width + ci)
              case 4 => colElem(c)
            }
            reuse.update(i, v)
            i += 1
          }
          ci += 1
          return true
        } else ci += 1
      }
    }
    false
  }
  override def get(): InternalRow = reuse
  override def close(): Unit = h5.close()
}
