package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal HDF5 writer for SONATA spike files — the S8 surface the
  * reference implements with h5py (converters/convert_spikes.py:133-145:
  * `/spikes/<population>/{timestamps: f64, node_ids: u64}` with a
  * `sorting` attribute and a `units` attribute on timestamps).
  *
  * Emits the same structures `Hdf5File` reads and h5py writes by default:
  * superblock v0, v1 object headers, one-level symbol-table groups
  * (v1 B-tree + SNOD + local heap, heap offset 0 reserved as in h5py),
  * contiguous little-endian datasets. Round-tripped in Hdf5WriterSpec
  * through [[Hdf5File]], whose own decoding is pinned byte-level against
  * genuine h5py files — both sides are validated against the format, not
  * against each other's quirks.
  *
  * The writer materializes the whole file in one buffer: spike reports
  * are written per simulation by the converter (driver-side), and a
  * single simulation's spike list fits comfortably in driver memory —
  * the DISTRIBUTED interchange format remains parquet (README, SONATA
  * interop); this is the interop escape hatch back to SONATA tooling.
  */
object Hdf5Writer {

  /** SONATA sorting enum values (convert_spikes.py:136). */
  val SortNone = 0
  val SortById = 1
  val SortByTime = 2

  def writeSonataSpikes(
      path: String, population: String,
      timestamps: Array[Double], nodeIds: Array[Long],
      sorting: Int = SortByTime, units: String = "ms"): Unit = {
    require(timestamps.length == nodeIds.length, "timestamps/node_ids length mismatch")
    val n = timestamps.length
    val sortAttr = attrMessage("sorting", Left(sorting))
    val unitsAttr = attrMessage("units", Right(units))

    // ---- absolute layout --------------------------------------------------
    def pad8(x: Long) = ((x + 7) / 8) * 8
    // local heap: 32-byte header + data segment (8 reserved zero bytes as
    // h5py, then padded names)
    def heapBytes(names: Seq[String]) = 32L + 8L + names.map(s => pad8(s.length + 1L)).sum
    val btreeBytes = 24L + 3 * 8L // level-0, one child: key, child, key
    def snodBytes(entries: Int) = 8L + entries * 40L
    val ohdrSymtab = 16L + (8 + 16) // prefix + symbol-table message

    val superblock = 0L
    val rootOhdr = 96L
    val rootHeap = rootOhdr + ohdrSymtab
    val rootBtree = rootHeap + heapBytes(Seq("spikes"))
    val rootSnod = rootBtree + btreeBytes
    val spikesOhdr = rootSnod + snodBytes(1)
    val spikesHeap = spikesOhdr + ohdrSymtab
    val spikesBtree = spikesHeap + heapBytes(Seq(population))
    val spikesSnod = spikesBtree + btreeBytes
    val popOhdr = spikesSnod + snodBytes(1)
    val popOhdrSize = 16L + (8 + 16) + (8 + sortAttr.length)
    val popHeap = popOhdr + popOhdrSize
    val popBtree = popHeap + heapBytes(Seq("node_ids", "timestamps"))
    val popSnod = popBtree + btreeBytes
    val tsOhdr = popSnod + snodBytes(2)
    val dtSize = 24 // f64/u64 datatype message body (8 + properties, padded)
    val tsOhdrSize = 16L + (8 + 16) + (8 + dtSize) + (8 + 24) + (8 + unitsAttr.length)
    val idsOhdr = tsOhdr + tsOhdrSize
    val idsOhdrSize = 16L + (8 + 16) + (8 + dtSize) + (8 + 24)
    val tsData = idsOhdr + idsOhdrSize
    val idsData = tsData + 8L * n
    val eof = idsData + 8L * n
    // single-buffer writer: past ~134M spikes eof.toInt would wrap — fail
    // loudly; the distributed interchange format stays parquet (README)
    require(eof <= Int.MaxValue,
      s"writeSonataSpikes: $n spikes -> $eof bytes exceeds the 2 GiB " +
        "single-file writer limit (~134M spikes); keep spikes in parquet " +
        "and convert per-simulation chunks instead")

    val out = ByteBuffer.allocate(eof.toInt).order(ByteOrder.LITTLE_ENDIAN)

    // ---- building blocks --------------------------------------------------
    def msgHeader(typ: Int, size: Int): Unit = {
      out.putShort(typ.toShort); out.putShort(size.toShort); out.putInt(0)
    }
    def objectHeader(at: Long, nMsgs: Int, bodySize: Long): Unit = {
      out.position(at.toInt)
      out.put(1.toByte); out.put(0.toByte)
      out.putShort(nMsgs.toShort)
      out.putInt(1)
      out.putInt(bodySize.toInt)
      out.putInt(0) // prefix pad: messages start 8-aligned
    }
    def symtabMessage(btree: Long, heap: Long): Unit = {
      msgHeader(0x0011, 16)
      out.putLong(btree); out.putLong(heap)
    }
    /** Heap with h5py's reserved zero offset; returns each name's offset. */
    def localHeap(at: Long, names: Seq[String]): Seq[Long] = {
      val segSize = 8L + names.map(s => pad8(s.length + 1L)).sum
      out.position(at.toInt)
      out.putInt(0x50414548) // "HEAP"
      out.put(0.toByte); out.put(0.toByte); out.put(0.toByte); out.put(0.toByte)
      out.putLong(segSize)
      out.putLong(1L) // free list: 1 = none
      out.putLong(at + 32)
      var off = 8L
      names.map { nm =>
        val o = off
        out.position((at + 32 + o).toInt)
        out.put(nm.getBytes("UTF-8")); out.put(0.toByte)
        off += pad8(nm.length + 1L)
        o
      }
    }
    def btree(at: Long, snodAddr: Long, firstNameOff: Long, lastNameOff: Long): Unit = {
      out.position(at.toInt)
      out.putInt(0x45455254) // "TREE"
      out.put(0.toByte); out.put(0.toByte) // group node, level 0
      out.putShort(1)
      out.putLong(-1L); out.putLong(-1L)
      out.putLong(firstNameOff)
      out.putLong(snodAddr)
      out.putLong(lastNameOff)
    }
    def snodEntry(nameOff: Long, ohdr: Long, grpBtree: Long, grpHeap: Long): Unit = {
      out.putLong(nameOff)
      out.putLong(ohdr)
      out.putInt(if (grpBtree >= 0) 1 else 0) // cache type
      out.putInt(0)
      out.putLong(math.max(grpBtree, 0L)); out.putLong(math.max(grpHeap, 0L))
    }
    def snod(at: Long, entries: Int)(body: => Unit): Unit = {
      out.position(at.toInt)
      out.putInt(0x444f4e53) // "SNOD"
      out.put(1.toByte); out.put(0.toByte)
      out.putShort(entries.toShort)
      body
    }
    def dataspace1d(len: Long): Unit = {
      msgHeader(0x0001, 16)
      out.put(1.toByte); out.put(1.toByte); out.put(0.toByte) // v1, rank 1
      out.put(0.toByte); out.putInt(0)
      out.putLong(len)
    }
    def datatype64(float: Boolean): Unit = {
      msgHeader(0x0003, dtSize)
      if (float) {
        out.put(0x11.toByte) // v1, class 1
        out.put(0x20.toByte) // LE, IEEE flags
        out.put(0x3f.toByte); out.put(0.toByte)
        out.putInt(8)
        out.putShort(0); out.putShort(64)
        out.put(52.toByte); out.put(11.toByte); out.put(0.toByte); out.put(52.toByte)
        out.putInt(1023)
        out.putInt(0) // pad to dtSize
      } else {
        out.put(0x10.toByte) // v1, class 0
        out.put(0x00.toByte) // LE, unsigned (u64 per the SONATA dtype)
        out.put(0.toByte); out.put(0.toByte)
        out.putInt(8)
        out.putShort(0); out.putShort(64)
        out.putInt(0); out.putInt(0); out.putInt(0) // pad to dtSize
      }
    }
    def layoutContiguous(addr: Long, size: Long): Unit = {
      msgHeader(0x0008, 24)
      out.put(3.toByte); out.put(1.toByte)
      out.putLong(addr); out.putLong(size)
      out.putInt(0); out.putShort(0)
    }

    // ---- superblock v0 + root entry --------------------------------------
    out.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
    out.put(0.toByte) // superblock v0
    out.put(0.toByte); out.put(0.toByte); out.put(0.toByte); out.put(0.toByte)
    out.put(8.toByte); out.put(8.toByte); out.put(0.toByte)
    out.putShort(4); out.putShort(16)
    out.putInt(0)
    out.putLong(0L) // base
    out.putLong(-1L) // free space
    out.putLong(eof)
    out.putLong(-1L) // driver info
    out.putLong(0L) // root link name offset
    out.putLong(rootOhdr)
    out.putInt(1); out.putInt(0) // cache type 1
    out.putLong(rootBtree); out.putLong(rootHeap)

    // ---- groups -----------------------------------------------------------
    objectHeader(rootOhdr, 1, 8 + 16)
    symtabMessage(rootBtree, rootHeap)
    val rootNames = localHeap(rootHeap, Seq("spikes"))
    btree(rootBtree, rootSnod, 0L, rootNames(0))
    snod(rootSnod, 1)(snodEntry(rootNames(0), spikesOhdr, spikesBtree, spikesHeap))

    objectHeader(spikesOhdr, 1, 8 + 16)
    symtabMessage(spikesBtree, spikesHeap)
    val spikesNames = localHeap(spikesHeap, Seq(population))
    btree(spikesBtree, spikesSnod, 0L, spikesNames(0))
    snod(spikesSnod, 1)(snodEntry(spikesNames(0), popOhdr, popBtree, popHeap))

    objectHeader(popOhdr, 2, popOhdrSize - 16)
    symtabMessage(popBtree, popHeap)
    msgHeader(0x000C, sortAttr.length)
    out.put(sortAttr)
    val dsNames = localHeap(popHeap, Seq("node_ids", "timestamps")) // alphabetical
    btree(popBtree, popSnod, 0L, dsNames(1))
    snod(popSnod, 2) {
      snodEntry(dsNames(0), idsOhdr, -1L, -1L)
      snodEntry(dsNames(1), tsOhdr, -1L, -1L)
    }

    // ---- datasets ---------------------------------------------------------
    objectHeader(tsOhdr, 4, tsOhdrSize - 16)
    dataspace1d(n)
    datatype64(float = true)
    layoutContiguous(tsData, 8L * n)
    msgHeader(0x000C, unitsAttr.length)
    out.put(unitsAttr)

    objectHeader(idsOhdr, 3, idsOhdrSize - 16)
    dataspace1d(n)
    datatype64(float = false)
    layoutContiguous(idsData, 8L * n)

    // ---- data -------------------------------------------------------------
    out.position(tsData.toInt)
    timestamps.foreach(out.putDouble)
    nodeIds.foreach(out.putLong)

    val s = new BufferedOutputStream(new FileOutputStream(path))
    try s.write(out.array()) finally s.close()
  }

  // ---- v1 attribute message (8-padded name/datatype/dataspace blocks) -----

  private def padArr(b: Array[Byte]): Array[Byte] =
    b ++ new Array[Byte]((8 - b.length % 8) % 8)

  private def attrMessage(name: String, value: Either[Int, String]): Array[Byte] = {
    val nameRaw = name.getBytes("UTF-8") :+ 0.toByte
    val (dtRaw, dataRaw) = value match {
      case Left(v) =>
        // enum dtype identical to h5py.enum_dtype({"none":0,"by_id":1,
        // "by_time":2}) (convert_spikes.py:138) so strict SONATA readers
        // (libsonata) accept the attribute; v1 enum member names are
        // NUL-terminated and 8-padded, values follow in base-type units
        val base = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
        base.put(0x10.toByte); base.put(0x08.toByte) // v1 class 0, LE signed
        base.put(0.toByte); base.put(0.toByte)
        base.putInt(4)
        base.putShort(0); base.putShort(32)
        val names = Seq("none", "by_id", "by_time")
          .flatMap(s => padArr(s.getBytes("UTF-8") :+ 0.toByte)).toArray
        val vals = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
        vals.putInt(0); vals.putInt(1); vals.putInt(2)
        val head = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        head.put(0x18.toByte) // v1, class 8 (enum)
        head.put(3.toByte); head.put(0.toByte); head.put(0.toByte) // 3 members
        head.putInt(4)
        val d = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        d.putInt(v)
        (head.array() ++ base.array() ++ names ++ vals.array(), d.array())
      case Right(v) =>
        val bytes = v.getBytes("UTF-8") :+ 0.toByte
        val dt = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        dt.put(0x13.toByte) // v1, class 3 fixed string
        dt.put(0.toByte); dt.put(0.toByte); dt.put(0.toByte)
        dt.putInt(bytes.length)
        (dt.array(), bytes)
    }
    val ds = Array[Byte](1, 0, 0, 0, 0, 0, 0, 0) // v1 scalar dataspace
    val head = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    head.put(1.toByte); head.put(0.toByte)
    head.putShort(nameRaw.length.toShort)
    head.putShort(dtRaw.length.toShort)
    head.putShort(ds.length.toShort)
    padArr(head.array() ++ padArr(nameRaw) ++ padArr(dtRaw) ++ padArr(ds) ++ dataRaw)
  }
}
