package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.ByteBuffer
import java.nio.ByteOrder

/** pandas-HDFStore "fixed"-format dataframe files — the layout
  * `DataFrame.to_hdf(path, key)` emits (the reference's HDF cache store,
  * store/hdf.py:27-48, with its category→object workaround) and
  * `pd.read_hdf` expects: a `/<key>` group carrying `pandas_type="frame"`
  * attributes, `axis0` column names, the row index as `axis1` (regular)
  * or `axis1_level{i}`/`axis1_label{i}` datasets (MultiIndex), and the
  * values consolidated into per-dtype `block{b}_items`/`block{b}_values`
  * pairs stored transposed — conventions per the public
  * pandas/io/pytables.py (`GenericFixed`/`FrameFixed`) and PyTables
  * attribute schema (TITLE/CLASS/VERSION/FLAVOR).
  *
  * Index columns use the engine-wide `_index:<i>:<name>` convention
  * (same as [[FeatherIO]]): they become the stored pandas index; all
  * other columns become data blocks. Round-trip is exact for
  * long/double/string columns (double NaN included); boolean/int32/
  * float32 coerce up the way pandas consolidation would.
  *
  * Like the feather store, this is the pandas-interop tier of the cache
  * (single file, driver-side IO) — the scale path remains parquet.
  */
object PandasHdf {

  // ---- attribute plumbing (v3 attribute messages on OHDR v2) --------------

  private def scalarDs = Array[Byte](2, 0, 0, 0) // v2 dataspace, rank 0

  private def dtypeI64: Array[Byte] = {
    val b = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x10.toByte); b.put(0x08.toByte) // v1 class 0, LE signed
    b.put(0.toByte); b.put(0.toByte)
    b.putInt(8); b.putShort(0); b.putShort(64)
    b.array()
  }

  private def dtypeU8: Array[Byte] = {
    val b = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x10.toByte); b.put(0.toByte) // v1 class 0, LE unsigned
    b.put(0.toByte); b.put(0.toByte)
    b.putInt(1); b.putShort(0); b.putShort(8)
    b.array()
  }

  /** Fixed-width NUL-padded ASCII/UTF-8 string (PyTables stores numpy
    * S-dtype scalars and arrays this way).
    */
  private def dtypeStr(width: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x13.toByte) // v1, class 3 (string)
    b.put(0.toByte); b.put(0.toByte); b.put(0.toByte) // NUL-terminated, ASCII
    b.putInt(width)
    b.array()
  }

  private def attrV3(
      name: String, dtRaw: Array[Byte], dsRaw: Array[Byte],
      dataRaw: Array[Byte]): Array[Byte] = {
    val nameRaw = name.getBytes("UTF-8") :+ 0.toByte
    // v3 attribute-message size fields are unsigned 16-bit; past 64 KiB
    // the .toShort truncation would silently corrupt the file (same
    // conversion-contract guard as Hdf5Writer.ohdrV2/linkMsg)
    require(nameRaw.length <= 0xFFFF && dtRaw.length <= 0xFFFF &&
      dsRaw.length <= 0xFFFF,
      s"pandas-hdf fixed: attribute '$name' exceeds the 64 KiB field limit")
    val head = ByteBuffer.allocate(9).order(ByteOrder.LITTLE_ENDIAN)
    head.put(3.toByte); head.put(0.toByte)
    head.putShort(nameRaw.length.toShort)
    head.putShort(dtRaw.length.toShort)
    head.putShort(dsRaw.length.toShort)
    head.put(0.toByte)
    head.array() ++ nameRaw ++ dtRaw ++ dsRaw ++ dataRaw
  }

  private def strAttr(name: String, v: String): (Int, Array[Byte]) = {
    val raw = v.getBytes("UTF-8") :+ 0.toByte // width ≥ 1 even for ""
    0x0C -> attrV3(name, dtypeStr(raw.length), scalarDs, raw)
  }

  private def i64Attr(name: String, v: Long): (Int, Array[Byte]) = {
    val d = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    d.putLong(v)
    0x0C -> attrV3(name, dtypeI64, scalarDs, d.array())
  }

  private def u8Attr(name: String, v: Int): (Int, Array[Byte]) =
    0x0C -> attrV3(name, dtypeU8, scalarDs, Array(v.toByte))

  /** The PyTables node boilerplate every group/array carries. */
  private def nodeAttrs(cls: String): Seq[(Int, Array[Byte])] = Seq(
    strAttr("TITLE", ""), strAttr("CLASS", cls), strAttr("VERSION",
      if (cls == "GROUP") "1.0" else "2.4")) ++
    (if (cls == "ARRAY") Seq(strAttr("FLAVOR", "numpy")) else Nil)

  // ---- write --------------------------------------------------------------

  private sealed trait ColData
  private final case class I64Col(vals: Array[Long]) extends ColData
  private final case class F64Col(vals: Array[Double]) extends ColData
  private final case class StrCol(vals: Array[String]) extends ColData

  private final case class Ds(
      name: String, size: Long,
      msgs: Long => Seq[(Int, Array[Byte])],
      write: (ByteBuffer, Long) => Unit)

  private def strBytes(vals: Array[String], width: Int): Array[Byte] = {
    val out = new Array[Byte](vals.length * width)
    var i = 0
    while (i < vals.length) {
      val raw = vals(i).getBytes("UTF-8")
      require(raw.length <= width, "internal: string wider than block width")
      System.arraycopy(raw, 0, out, i * width, raw.length)
      i += 1
    }
    out
  }

  private def strWidth(vals: Array[String]): Int =
    math.max(1, if (vals.isEmpty) 1 else vals.map(_.getBytes("UTF-8").length).max)

  /** 1-D array dataset with PyTables attrs (`kind` for axes, `name` for
    * pandas' axis role).
    */
  private def arrayDs(
      dsName: String, data: ColData, extraAttrs: Seq[(Int, Array[Byte])]): Ds =
    data match {
      case I64Col(v) => Ds(dsName, 8L * v.length,
        a => Seq(0x01 -> Hdf5Writer.dataspaceV2(v.length),
          0x03 -> dtypeI64,
          0x08 -> Hdf5Writer.layoutC(a, 8L * v.length)) ++
          nodeAttrs("ARRAY") ++ extraAttrs,
        (out, a) => { out.position(a.toInt); v.foreach(out.putLong) })
      case F64Col(v) => Ds(dsName, 8L * v.length,
        a => Seq(0x01 -> Hdf5Writer.dataspaceV2(v.length),
          0x03 -> Hdf5Writer.dtype64(float = true),
          0x08 -> Hdf5Writer.layoutC(a, 8L * v.length)) ++
          nodeAttrs("ARRAY") ++ extraAttrs,
        (out, a) => { out.position(a.toInt); v.foreach(out.putDouble) })
      case StrCol(v) =>
        val w = strWidth(v)
        Ds(dsName, w.toLong * v.length,
          a => Seq(0x01 -> Hdf5Writer.dataspaceV2(v.length),
            0x03 -> dtypeStr(w),
            0x08 -> Hdf5Writer.layoutC(a, w.toLong * v.length)) ++
            nodeAttrs("ARRAY") ++ extraAttrs,
          (out, a) => { out.position(a.toInt); out.put(strBytes(v, w)) })
    }

  /** 2-D block-values dataset, stored (nItems × nRows) with
    * `transposed=True` — pandas keeps blocks as values.T on disk.
    */
  private def valuesDs(dsName: String, cols: Seq[ColData], nRows: Int): Ds = {
    val nItems = cols.size.toLong
    cols.head match {
      case _: I64Col =>
        val flat = cols.flatMap { case I64Col(v) => v.toSeq; case _ => Nil }.toArray
        Ds(dsName, 8L * flat.length,
          a => Seq(0x01 -> Hdf5Writer.dataspace2d(nItems, nRows),
            0x03 -> dtypeI64,
            0x08 -> Hdf5Writer.layoutC(a, 8L * flat.length)) ++
            nodeAttrs("ARRAY") ++ Seq(u8Attr("transposed", 1)),
          (out, a) => { out.position(a.toInt); flat.foreach(out.putLong) })
      case _: F64Col =>
        val flat = cols.flatMap { case F64Col(v) => v.toSeq; case _ => Nil }.toArray
        Ds(dsName, 8L * flat.length,
          a => Seq(0x01 -> Hdf5Writer.dataspace2d(nItems, nRows),
            0x03 -> Hdf5Writer.dtype64(float = true),
            0x08 -> Hdf5Writer.layoutC(a, 8L * flat.length)) ++
            nodeAttrs("ARRAY") ++ Seq(u8Attr("transposed", 1)),
          (out, a) => { out.position(a.toInt); flat.foreach(out.putDouble) })
      case _: StrCol =>
        val all = cols.flatMap { case StrCol(v) => v.toSeq; case _ => Nil }.toArray
        val w = strWidth(all)
        Ds(dsName, w.toLong * all.length,
          a => Seq(0x01 -> Hdf5Writer.dataspace2d(nItems, nRows),
            0x03 -> dtypeStr(w),
            0x08 -> Hdf5Writer.layoutC(a, w.toLong * all.length)) ++
            nodeAttrs("ARRAY") ++ Seq(u8Attr("transposed", 1)),
          (out, a) => { out.position(a.toInt); out.put(strBytes(all, w)) })
    }
  }

  private val IndexCol = "_index:(\\d+):(.*)".r

  def write(df: DataFrame, path: String, key: String,
      maxBytes: Long = Int.MaxValue): Unit = {
    val schema = df.schema

    // schema validation runs on metadata alone, before any data moves
    schema.fields.foreach { f =>
      f.dataType match {
        case LongType | IntegerType | ShortType | ByteType | BooleanType |
          DoubleType | FloatType | StringType => ()
        case other => throw new IllegalArgumentException(
          s"pandas-hdf fixed: unsupported column type $other (${f.name}) — " +
            "cache frames hold long/double/string columns")
      }
    }

    // Pre-flight size estimate BEFORE df.collect(): one distributed agg
    // (count + max byte-length per string column) bounds the stored data
    // volume — numerics store 8 B/row, strings their max width (index
    // strings at least 8 B/row to cover MultiIndex label arrays). The
    // exact eof check below still guards the final layout; this one fires
    // before the driver materializes an over-limit frame.
    {
      import org.apache.spark.sql.functions.{coalesce, col, count, lit, max, octet_length}
      val strCols = schema.fields.filter(_.dataType == StringType).map(_.name)
      val aggCols = count(lit(1)).as("_n") +:
        strCols.map(c => coalesce(max(octet_length(col(c))), lit(0)).as(s"_w_$c"))
      val stat = df.agg(aggCols.head, aggCols.tail: _*).head()
      val n0 = stat.getLong(0)
      val strW = strCols.zipWithIndex.map { case (c, i) =>
        c -> math.max(1L, stat.getInt(i + 1).toLong)
      }.toMap
      val rowBytes = schema.fields.map { f =>
        val w = f.dataType match {
          case StringType => strW(f.name)
          case _ => 8L
        }
        if (f.name.startsWith("_index:")) math.max(w, 8L) else w
      }.sum
      val est = n0 * rowBytes
      require(est <= maxBytes,
        s"pandas-hdf fixed: ~$est bytes (estimated from $n0 rows) exceeds " +
          s"the $maxBytes-byte single-buffer writer limit; large cache " +
          "frames belong in the parquet store")
    }

    val rows = df.collect()
    val n = rows.length

    def columnData(i: Int, f: StructField): ColData = f.dataType match {
      case LongType | IntegerType | ShortType | ByteType | BooleanType =>
        I64Col(rows.map { r =>
          require(!r.isNullAt(i), s"pandas-hdf fixed: null in integer column ${f.name}")
          f.dataType match {
            case BooleanType => if (r.getBoolean(i)) 1L else 0L
            case _ => r.get(i) match { case x: Number => x.longValue() }
          }
        })
      case DoubleType | FloatType =>
        F64Col(rows.map(r =>
          if (r.isNullAt(i)) Double.NaN
          else r.get(i) match { case x: Number => x.doubleValue() }))
      case StringType =>
        StrCol(rows.map { r =>
          require(!r.isNullAt(i), s"pandas-hdf fixed: null in string column ${f.name}")
          r.getString(i)
        })
      case other => throw new IllegalArgumentException(
        s"pandas-hdf fixed: unsupported column type $other (${f.name}) — " +
          "cache frames hold long/double/string columns")
    }

    // split off `_index:<i>:<name>` columns → the stored pandas index
    val indexed = schema.fields.zipWithIndex.flatMap { case (f, i) =>
      f.name match {
        case IndexCol(lvl, nm) => Some((lvl.toInt, nm, i, f))
        case _ => None
      }
    }.sortBy(_._1)
    val dataCols = schema.fields.zipWithIndex.filter {
      case (f, _) => !f.name.startsWith("_index:")
    }

    def kindOf(c: ColData): String = c match {
      case _: I64Col => "integer"
      case _: F64Col => "float"
      case _: StrCol => "string"
    }

    // index datasets + the axis1 group attributes they need
    val (indexDs, indexAttrs): (Seq[Ds], Seq[(Int, Array[Byte])]) =
      if (indexed.length <= 1) {
        val (nm, data) = indexed.headOption match {
          case Some((_, nm0, i, f)) => (nm0, columnData(i, f))
          case None => ("index", I64Col(Array.tabulate(n)(_.toLong)))
        }
        (Seq(arrayDs("axis1", data,
          Seq(strAttr("kind", kindOf(data)), strAttr("name", nm)))),
          Seq(strAttr("axis1_variety", "regular")))
      } else {
        val ds = indexed.zipWithIndex.flatMap { case ((_, nm, i, f), lvl) =>
          val data = columnData(i, f)
          // factorize: level uniques in first-appearance order + codes
          val (levels, labels) = data match {
            case I64Col(v) =>
              val uniq = scala.collection.mutable.LinkedHashMap.empty[Long, Int]
              val codes = v.map(x => uniq.getOrElseUpdate(x, uniq.size).toLong)
              (I64Col(uniq.keys.toArray), codes)
            case F64Col(v) =>
              val uniq = scala.collection.mutable.LinkedHashMap.empty[Double, Int]
              val codes = v.map(x => uniq.getOrElseUpdate(x, uniq.size).toLong)
              (F64Col(uniq.keys.toArray), codes)
            case StrCol(v) =>
              val uniq = scala.collection.mutable.LinkedHashMap.empty[String, Int]
              val codes = v.map(x => uniq.getOrElseUpdate(x, uniq.size).toLong)
              (StrCol(uniq.keys.toArray), codes)
          }
          Seq(
            arrayDs(s"axis1_level$lvl", levels,
              Seq(strAttr("kind", kindOf(levels)), strAttr("name", nm))),
            arrayDs(s"axis1_label$lvl", I64Col(labels),
              Seq(strAttr("kind", "integer"), strAttr("name", nm))))
        }
        (ds.toSeq,
          Seq(strAttr("axis1_variety", "multi"),
            i64Attr("axis1_nlevels", indexed.length)) ++
            indexed.zipWithIndex.map { case ((_, nm, _, _), lvl) =>
              strAttr(s"axis1_name$lvl", nm)
            })
      }

    // consolidate data columns into per-dtype blocks (pandas block manager)
    val byType: Seq[(String, Seq[(StructField, Int)])] =
      Seq("float", "integer", "string").flatMap { k =>
        val cols = dataCols.filter { case (f, _) =>
          (k, f.dataType) match {
            case ("float", DoubleType | FloatType) => true
            case ("integer", LongType | IntegerType | ShortType | ByteType |
              BooleanType) => true
            case ("string", StringType) => true
            case _ => false
          }
        }
        if (cols.isEmpty) None else Some(k -> cols.toSeq)
      }
    val blockDs = byType.zipWithIndex.flatMap { case ((_, cols), b) =>
      Seq(
        arrayDs(s"block${b}_items", StrCol(cols.map(_._1.name).toArray),
          Seq(strAttr("kind", "string"), strAttr("name", "N."))),
        valuesDs(s"block${b}_values",
          cols.map { case (f, i) => columnData(i, f) }, n))
    }

    val axis0 = arrayDs("axis0", StrCol(dataCols.map(_._1.name).toArray),
      Seq(strAttr("kind", "string"), strAttr("name", "columns")))

    val allDs = axis0 +: (indexDs ++ blockDs)

    // ---- assemble the file (two-pass address layout, as the other
    // v2-writer paths do) ---------------------------------------------------
    def groupMsgs(links: Seq[(String, Long)], attrs: Seq[(Int, Array[Byte])]) =
      Seq(0x02 -> Hdf5Writer.linkInfo, 0x0A -> Hdf5Writer.groupInfo) ++
        links.map { case (nm, a) => 0x06 -> Hdf5Writer.linkMsg(nm, a) } ++ attrs

    val rootAttrs = nodeAttrs("GROUP") ++
      Seq(strAttr("PYTABLES_FORMAT_VERSION", "2.1"))
    val keyAttrs = nodeAttrs("GROUP") ++ Seq(
      strAttr("pandas_type", "frame"),
      strAttr("pandas_version", "0.15.2"),
      strAttr("encoding", "UTF-8"),
      strAttr("errors", "strict"),
      i64Attr("ndim", 2),
      strAttr("axis0_variety", "regular"),
      i64Attr("nblocks", byType.size)) ++ indexAttrs

    val rootOhdr = 48L
    val keyOhdr = rootOhdr +
      Hdf5Writer.ohdrSize(groupMsgs(Seq(key -> 0L), rootAttrs))
    var cursor = keyOhdr +
      Hdf5Writer.ohdrSize(groupMsgs(allDs.map(_.name -> 0L), keyAttrs))
    val placed = allDs.map { ds =>
      val ohdrAt = cursor
      val dataAt = ohdrAt + Hdf5Writer.ohdrSize(ds.msgs(0L))
      cursor = dataAt + ds.size
      (ds, ohdrAt, dataAt)
    }
    val eof = cursor
    require(eof <= math.min(maxBytes, Int.MaxValue.toLong),
      s"pandas-hdf fixed: $eof bytes exceeds the 2 GiB single-buffer " +
        "writer limit; large cache frames belong in the parquet store")

    val out = Hdf5Writer.bbuf(eof.toInt)
    Hdf5Writer.superblockV2(out, eof, rootOhdr)
    def put(at: Long, bytes: Array[Byte]): Unit = {
      out.position(at.toInt); out.put(bytes)
    }
    put(rootOhdr, Hdf5Writer.ohdrV2(groupMsgs(Seq(key -> keyOhdr), rootAttrs)))
    put(keyOhdr, Hdf5Writer.ohdrV2(groupMsgs(
      placed.map(p => p._1.name -> p._2), keyAttrs)))
    placed.foreach { case (ds, ohdrAt, dataAt) =>
      put(ohdrAt, Hdf5Writer.ohdrV2(ds.msgs(dataAt)))
      ds.write(out, dataAt)
    }
    val s = new BufferedOutputStream(new FileOutputStream(path))
    try s.write(out.array()) finally s.close()
  }

  // ---- read ---------------------------------------------------------------

  private def readCol(h5: Hdf5File, p: String): ColData =
    try StrCol(h5.readStrings(p))
    catch {
      case _: IllegalArgumentException =>
        if (h5.isIntegerType(p)) I64Col(h5.readLongs(p))
        else F64Col(h5.readDoubles(p))
    }

  private def colValues(c: ColData): IndexedSeq[Any] = c match {
    case I64Col(v) => v.toIndexedSeq
    case F64Col(v) => v.toIndexedSeq
    case StrCol(v) => v.toIndexedSeq
  }

  private def colType(c: ColData): DataType = c match {
    case _: I64Col => LongType
    case _: F64Col => DoubleType
    case _: StrCol => StringType
  }

  /** Load `/<key>` (or the file's only frame group) back into a
    * DataFrame: index levels surface as `_index:<i>:<name>` columns
    * (dropped when the stored index is the anonymous RangeIndex a
    * no-index write produced), then data columns in `axis0` order.
    */
  def read(spark: SparkSession, path: String, key: Option[String] = None): DataFrame = {
    val h5 = new Hdf5File(path)
    try {
      val k = key.getOrElse(h5.ls("").headOption.getOrElse(
        throw new IllegalArgumentException(s"$path: empty HDF file")))
      val base = s"/$k"
      h5.attr(base, "pandas_type").collect { case s: String => s } match {
        case Some("frame") => ()
        case Some(t) if t.contains("table") =>
          // pytables table format (pandas_type="frame_table") is a
          // different on-disk layout entirely (one packed record table +
          // indexes); only format='fixed' is supported here, matching the
          // reference store's own writes (blueetl/store/hdf.py:30-38
          // HDFStoreFixed)
          throw new IllegalArgumentException(
            s"$path: /$k is a table-format HDF frame (pandas_type=$t); " +
              "only format='fixed' frames are supported — re-write with " +
              "pandas .to_hdf(..., format='fixed')")
        case other =>
          throw new IllegalArgumentException(
            s"$path: /$k is not a pandas fixed frame group " +
              s"(pandas_type=${other.getOrElse("<absent>")})")
      }
      val axis0 = h5.readStrings(s"$base/axis0")
      val variety = h5.attr(base, "axis1_variety").getOrElse("regular")

      val indexCols: Seq[(String, ColData)] = variety match {
        case "multi" =>
          val nLevels = h5.attr(base, "axis1_nlevels")
            .collect { case d: Double => d.toInt }.getOrElse(0)
          (0 until nLevels).map { lvl =>
            val nm = h5.attr(base, s"axis1_name$lvl")
              .collect { case s: String => s }.getOrElse(s"level_$lvl")
            val levels = readCol(h5, s"$base/axis1_level$lvl")
            val labels = h5.readLongs(s"$base/axis1_label$lvl")
            val lv = colValues(levels)
            val expanded: ColData = levels match {
              case _: I64Col => I64Col(labels.map(c => lv(c.toInt).asInstanceOf[Long]))
              case _: F64Col => F64Col(labels.map(c => lv(c.toInt).asInstanceOf[Double]))
              case _: StrCol => StrCol(labels.map(c => lv(c.toInt).asInstanceOf[String]))
            }
            (s"_index:$lvl:$nm", expanded)
          }
        case _ =>
          val nm = h5.attr(base, "name").orElse(h5.attr(s"$base/axis1", "name"))
            .collect { case s: String => s }.getOrElse("index")
          // the anonymous RangeIndex written for index-less frames reads
          // back as no index columns at all
          if (nm == "index") Nil
          else Seq((s"_index:0:$nm", readCol(h5, s"$base/axis1")))
      }

      val nBlocks = h5.attr(base, "nblocks")
        .collect { case d: Double => d.toInt }.getOrElse(0)
      val byName = (0 until nBlocks).flatMap { b =>
        val items = h5.readStrings(s"$base/block${b}_items")
        val vp = s"$base/block${b}_values"
        val nRows = h5.dims(vp)(1)
        // read once, slice per item (values are row-major (nItems, nRows))
        val all = readCol(h5, vp)
        items.zipWithIndex.map { case (nm, i) =>
          val sliced: ColData = all match {
            case I64Col(v) => I64Col(v.slice((i * nRows).toInt, ((i + 1) * nRows).toInt))
            case F64Col(v) => F64Col(v.slice((i * nRows).toInt, ((i + 1) * nRows).toInt))
            case StrCol(v) => StrCol(v.slice((i * nRows).toInt, ((i + 1) * nRows).toInt))
          }
          nm -> sliced
        }
      }.toMap

      val ordered: Seq[(String, ColData)] =
        indexCols ++ axis0.toSeq.map(nm => nm -> byName(nm))
      val n = ordered.headOption.map(c => colValues(c._2).length).getOrElse(0)
      val schema = StructType(ordered.map { case (nm, c) =>
        StructField(nm, colType(c), nullable = true)
      })
      val data = (0 until n).map { r =>
        Row.fromSeq(ordered.map { case (_, c) =>
          val v = colValues(c)(r)
          v match {
            case d: Double if d.isNaN => null
            case x => x
          }
        })
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(data, math.max(1, math.min(8, n))), schema)
    } finally h5.close()
  }
}
