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

  // ---- superblock v2 + OHDR v2 variant ------------------------------------

  /** Same SONATA spikes layout through the modern on-disk structures h5py
    * emits with `libver="latest"`: superblock v2, version-2 ("OHDR")
    * object headers with lookup3 checksums, new-style compact groups
    * (link-info/group-info/link messages), v3 attributes. Exists so the
    * reader's libver='latest' support is pinned by a real file — and as
    * the interop escape hatch for tools that require the new format.
    *
    * `chunkRows > 0` stores the datasets CHUNKED under a v4 data layout
    * with a Fixed Array chunk index ("FAHD"/"FADB", paged when the chunk
    * count exceeds one 4-entry page) — the index h5py's libver='latest'
    * writes for fixed-shape chunked data.
    */
  def writeSonataSpikesV2(
      path: String, population: String,
      timestamps: Array[Double], nodeIds: Array[Long],
      sorting: Int = SortByTime, units: String = "ms",
      chunkRows: Int = 0): Unit = {
    require(timestamps.length == nodeIds.length, "timestamps/node_ids length mismatch")
    val n = timestamps.length
    def bb(size: Int) = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)

    // ---- v4 chunked layout + Fixed Array index ----------------------------
    val chunked = chunkRows > 0
    val nChunks = if (chunked) (n + chunkRows - 1) / chunkRows else 0
    val PageElems = 4 // 2^pageBits with pageBits=2: small pages so specs hit paging
    val paged = chunked && nChunks > PageElems
    val nPages = if (chunked) (nChunks + PageElems - 1) / PageElems else 0
    val chunkBytes = 8L * chunkRows
    val fadbSize: Long =
      if (!chunked) 0L
      else if (!paged) 14L + nChunks * 8L + 4L
      else 14L + (nPages + 7) / 8 + 4L + (0 until nPages).map { p =>
        math.min(PageElems, nChunks - p * PageElems) * 8L + 4L
      }.sum
    // one dataset's storage region: FAHD + FADB + packed full-size chunks
    val dataRegion: Long =
      if (chunked) 28L + fadbSize + nChunks * chunkBytes else 8L * n

    def layoutV4(fahd: Long): Array[Byte] = {
      val b = bb(23)
      b.put(4.toByte); b.put(2.toByte) // version 4, chunked
      b.put(0.toByte) // flags
      b.put(1.toByte) // rank (v4 has no trailing element-size dim)
      b.put(8.toByte) // dim sizes encoded in 8 bytes
      b.putLong(chunkRows.toLong)
      b.put(3.toByte) // chunk index: fixed array
      b.put(2.toByte) // page bits
      b.putLong(fahd)
      b.array()
    }


    val sortAttr = attrMessageV3("sorting", Left(sorting))
    val unitsAttr = attrMessageV3("units", Right(units))
    // addresses embed as fixed 8-byte fields, so sizes are
    // address-independent: size with dummies, then build with real ones
    def rootMsgs(spikes: Long) =
      Seq(0x02 -> linkInfo, 0x0A -> groupInfo, 0x06 -> linkMsg("spikes", spikes))
    def spikesMsgs(pop: Long) =
      Seq(0x02 -> linkInfo, 0x0A -> groupInfo, 0x06 -> linkMsg(population, pop))
    def popMsgs(ids: Long, ts: Long) = Seq(
      0x02 -> linkInfo, 0x0A -> groupInfo,
      0x06 -> linkMsg("node_ids", ids), 0x06 -> linkMsg("timestamps", ts),
      0x0C -> sortAttr)
    def layoutMsg(data: Long): Array[Byte] =
      if (chunked) layoutV4(data) else layoutC(data, 8L * n)
    def tsMsgs(data: Long) = Seq(
      0x01 -> dataspaceV2(n), 0x03 -> dtype64(float = true),
      0x08 -> layoutMsg(data), 0x0C -> unitsAttr)
    def idsMsgs(data: Long) = Seq(
      0x01 -> dataspaceV2(n), 0x03 -> dtype64(float = false),
      0x08 -> layoutMsg(data))

    val rootOhdr = 48L
    val spikesOhdr = rootOhdr + ohdrSize(rootMsgs(0))
    val popOhdr = spikesOhdr + ohdrSize(spikesMsgs(0))
    val tsOhdr = popOhdr + ohdrSize(popMsgs(0, 0))
    val idsOhdr = tsOhdr + ohdrSize(tsMsgs(0))
    val tsData = idsOhdr + ohdrSize(idsMsgs(0))
    val idsData = tsData + dataRegion
    val eof = idsData + dataRegion
    require(eof <= Int.MaxValue,
      s"writeSonataSpikesV2: $n spikes -> $eof bytes exceeds the 2 GiB " +
        "single-file writer limit (~134M spikes); keep spikes in parquet " +
        "and convert per-simulation chunks instead")

    val out = bb(eof.toInt)
    superblockV2(out, eof, rootOhdr)

    out.position(rootOhdr.toInt); out.put(ohdrV2(rootMsgs(spikesOhdr)))
    out.position(spikesOhdr.toInt); out.put(ohdrV2(spikesMsgs(popOhdr)))
    out.position(popOhdr.toInt); out.put(ohdrV2(popMsgs(idsOhdr, tsOhdr)))
    out.position(tsOhdr.toInt); out.put(ohdrV2(tsMsgs(tsData)))
    out.position(idsOhdr.toInt); out.put(ohdrV2(idsMsgs(idsData)))

    /** FAHD + FADB (paged past one page) + packed full-size chunks. */
    def writeFixedArray(at: Long, putElem: Long => Unit): Unit = {
      val chunksAt = at + 28 + fadbSize
      out.position(at.toInt)
      out.putInt(0x44484146) // "FAHD"
      out.put(0.toByte); out.put(0.toByte) // version, client 0 (unfiltered)
      out.put(8.toByte) // entry size
      out.put(2.toByte) // page bits
      out.putLong(nChunks.toLong)
      out.putLong(at + 28)
      out.putInt(lookup3(
        java.util.Arrays.copyOfRange(out.array(), at.toInt, at.toInt + 24)))
      out.position((at + 28).toInt)
      out.putInt(0x42444146) // "FADB"
      out.put(0.toByte); out.put(0.toByte)
      out.putLong(at)
      def cksumFrom(start: Long): Unit = out.putInt(lookup3(
        java.util.Arrays.copyOfRange(out.array(), start.toInt, out.position())))
      if (!paged) {
        (0 until nChunks).foreach(i => out.putLong(chunksAt + i * chunkBytes))
        cksumFrom(at + 28)
      } else {
        (0 until ((nPages + 7) / 8)).foreach(_ => out.put(0xff.toByte)) // bitmap
        cksumFrom(at + 28)
        var i = 0
        while (i < nChunks) {
          val pStart = out.position()
          val cnt = math.min(PageElems, nChunks - i)
          (0 until cnt).foreach(k => out.putLong(chunksAt + (i + k) * chunkBytes))
          out.putInt(lookup3(
            java.util.Arrays.copyOfRange(out.array(), pStart, out.position())))
          i += cnt
        }
      }
      // chunk data: full-size chunks, zero padding past n in the last one
      out.position(chunksAt.toInt)
      (0L until nChunks.toLong * chunkRows).foreach(i =>
        putElem(if (i < n) i else -1L))
    }

    if (chunked) {
      writeFixedArray(tsData, i => out.putDouble(if (i < 0) 0.0 else timestamps(i.toInt)))
      writeFixedArray(idsData, i => out.putLong(if (i < 0) 0L else nodeIds(i.toInt)))
    } else {
      out.position(tsData.toInt)
      timestamps.foreach(out.putDouble)
      nodeIds.foreach(out.putLong)
    }

    val s = new BufferedOutputStream(new FileOutputStream(path))
    try s.write(out.array()) finally s.close()
  }

  /** Like [[writeSonataSpikesV2]] but the chunked datasets are indexed by
    * a v2 B-TREE chunk index (v4 layout index type 5 — what the library
    * emits for datasets with 2+ unlimited dimensions; the fixture keeps
    * rank 1, which the reader accepts since only the index structure
    * differs). `nodeSize` controls tree shape: a small node forces a
    * depth-1 tree (internal "BTIN" root over several leaves) at fixture
    * chunk counts; the default stays a depth-0 single-leaf root. Record
    * type 10: chunk address + scaled offset, field widths from the same
    * node-capacity math the reader derives.
    */
  def writeSonataSpikesBT(
      path: String, population: String,
      timestamps: Array[Double], nodeIds: Array[Long],
      sorting: Int = SortByTime, units: String = "ms",
      chunkRows: Int = 16, nodeSize: Int = 512): Unit = {
    require(timestamps.length == nodeIds.length, "timestamps/node_ids length mismatch")
    require(chunkRows > 0, "chunkRows must be positive")
    val n = timestamps.length
    def bb(size: Int) = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    val nChunks = math.max(1, (n + chunkRows - 1) / chunkRows)
    val chunkBytes = 8L * chunkRows
    val recordSize = 16 // type 10: chunk address + one scaled offset (rank 1)

    def log2(x: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val leafMax = (nodeSize - 10) / recordSize
    val maxNRecSize = log2(leafMax.toLong) / 8 + 1
    val depth1 = nChunks > leafMax
    val nLeaves = if (depth1) ((nChunks + 1) + leafMax) / (leafMax + 1) else 1
    val ptrSize = 8 + maxNRecSize
    val intMax = (nodeSize - 10 - ptrSize) / (recordSize + ptrSize)
    require(!depth1 || nLeaves - 1 <= intMax,
      s"writeSonataSpikesBT: $nChunks chunks need B-tree depth 2 at node size $nodeSize")
    val leafSizes: Seq[Int] =
      if (!depth1) Seq(nChunks)
      else {
        val total = nChunks - (nLeaves - 1)
        val base = total / nLeaves; val rem = total % nLeaves
        (0 until nLeaves).map(i => base + (if (i < rem) 1 else 0))
      }
    val leavesBytes = leafSizes.map(6L + _ * recordSize + 4).sum
    val intBytes =
      if (depth1) 6L + (nLeaves - 1) * recordSize + nLeaves.toLong * ptrSize + 4 else 0L
    // one dataset's storage region: BTHD, internal root, leaves, chunks
    val dataRegion = 38L + intBytes + leavesBytes + nChunks * chunkBytes

    def layoutBT(bthd: Long): Array[Byte] = {
      val b = bb(28)
      b.put(4.toByte); b.put(2.toByte) // version 4, chunked
      b.put(0.toByte) // flags
      b.put(1.toByte) // rank
      b.put(8.toByte) // dim sizes encoded in 8 bytes
      b.putLong(chunkRows.toLong)
      b.put(5.toByte) // chunk index: v2 B-tree
      b.putInt(nodeSize)
      b.put(100.toByte); b.put(40.toByte) // split / merge percent
      b.putLong(bthd)
      b.array()
    }

    val sortAttr = attrMessageV3("sorting", Left(sorting))
    val unitsAttr = attrMessageV3("units", Right(units))
    def rootMsgs(spikes: Long) =
      Seq(0x02 -> linkInfo, 0x0A -> groupInfo, 0x06 -> linkMsg("spikes", spikes))
    def spikesMsgs(pop: Long) =
      Seq(0x02 -> linkInfo, 0x0A -> groupInfo, 0x06 -> linkMsg(population, pop))
    def popMsgs(ids: Long, ts: Long) = Seq(
      0x02 -> linkInfo, 0x0A -> groupInfo,
      0x06 -> linkMsg("node_ids", ids), 0x06 -> linkMsg("timestamps", ts),
      0x0C -> sortAttr)
    def tsMsgs(bthd: Long) = Seq(
      0x01 -> dataspaceV2(n), 0x03 -> dtype64(float = true),
      0x08 -> layoutBT(bthd), 0x0C -> unitsAttr)
    def idsMsgs(bthd: Long) = Seq(
      0x01 -> dataspaceV2(n), 0x03 -> dtype64(float = false),
      0x08 -> layoutBT(bthd))

    val rootOhdr = 48L
    val spikesOhdr = rootOhdr + ohdrSize(rootMsgs(0))
    val popOhdr = spikesOhdr + ohdrSize(spikesMsgs(0))
    val tsOhdr = popOhdr + ohdrSize(popMsgs(0, 0))
    val idsOhdr = tsOhdr + ohdrSize(tsMsgs(0))
    val tsData = idsOhdr + ohdrSize(idsMsgs(0))
    val idsData = tsData + dataRegion
    val eof = idsData + dataRegion
    require(eof <= Int.MaxValue,
      s"writeSonataSpikesBT: $n spikes -> $eof bytes exceeds the 2 GiB " +
        "single-file writer limit; keep spikes in parquet and convert " +
        "per-simulation chunks instead")

    val out = bb(eof.toInt)
    superblockV2(out, eof, rootOhdr)
    out.position(rootOhdr.toInt); out.put(ohdrV2(rootMsgs(spikesOhdr)))
    out.position(spikesOhdr.toInt); out.put(ohdrV2(spikesMsgs(popOhdr)))
    out.position(popOhdr.toInt); out.put(ohdrV2(popMsgs(idsOhdr, tsOhdr)))
    out.position(tsOhdr.toInt); out.put(ohdrV2(tsMsgs(tsData)))
    out.position(idsOhdr.toInt); out.put(ohdrV2(idsMsgs(idsData)))

    /** BTHD + ("BTIN" +) "BTLF" leaves + packed full-size chunks. */
    def writeBtreeRegion(at: Long, putElem: Long => Unit): Unit = {
      def cksumFrom(start: Long): Unit = out.putInt(lookup3(
        java.util.Arrays.copyOfRange(out.array(), start.toInt, out.position())))
      val intAt = at + 38
      val leafAt = leafSizes
        .scanLeft(intAt + intBytes)((p, s) => p + 6 + s * recordSize + 4).init
      val chunksAt = at + 38 + intBytes + leavesBytes
      // chunk runs per leaf; the record after each run separates in the root
      val leafIdx: Seq[Seq[Int]] = {
        var pos = 0
        leafSizes.map { s =>
          val r = pos until (pos + s); pos += s + (if (depth1) 1 else 0); r
        }
      }
      def putRec(i: Int): Unit = {
        out.putLong(chunksAt + i * chunkBytes)
        out.putLong(i.toLong) // scaled offset
      }
      out.position(at.toInt)
      out.putInt(0x44485442) // "BTHD"
      out.put(0.toByte)
      out.put(10.toByte) // type: unfiltered chunk index
      out.putInt(nodeSize)
      out.putShort(recordSize.toShort)
      out.putShort(if (depth1) 1 else 0)
      out.put(100.toByte); out.put(40.toByte) // split / merge percent
      out.putLong(if (depth1) intAt else leafAt.head)
      out.putShort((if (depth1) nLeaves - 1 else nChunks).toShort)
      out.putLong(nChunks.toLong)
      cksumFrom(at)
      for ((idx, a) <- leafIdx.zip(leafAt)) {
        out.position(a.toInt)
        out.putInt(0x464c5442) // "BTLF"
        out.put(0.toByte)
        out.put(10.toByte)
        idx.foreach(putRec)
        cksumFrom(a)
      }
      if (depth1) {
        out.position(intAt.toInt)
        out.putInt(0x4e495442) // "BTIN"
        out.put(0.toByte)
        out.put(10.toByte)
        leafIdx.init.foreach(idx => putRec(idx.last + 1)) // separators
        for ((a, s) <- leafAt.zip(leafSizes)) {
          out.putLong(a)
          (0 until maxNRecSize).foreach(k => out.put(((s.toLong >> (8 * k)) & 0xff).toByte))
        }
        cksumFrom(intAt)
      }
      // chunk data: full-size chunks, zero padding past n in the last one
      out.position(chunksAt.toInt)
      (0L until nChunks.toLong * chunkRows).foreach(i =>
        putElem(if (i < n) i else -1L))
    }

    writeBtreeRegion(tsData, i => out.putDouble(if (i < 0) 0.0 else timestamps(i.toInt)))
    writeBtreeRegion(idsData, i => out.putLong(if (i < 0) 0L else nodeIds(i.toInt)))

    val s = new BufferedOutputStream(new FileOutputStream(path))
    try s.write(out.array()) finally s.close()
  }

  /** Extensible-Array geometry (public format spec): super block u holds
    * 2^(u/2) data blocks of 2^((u+1)/2)·minElems elements; the index block
    * stores `idxElmts` elements inline and points directly at the data
    * blocks of the first 2·log2(minPtrs) super blocks.
    */
  private final case class EaGeom(
      maxBits: Int, idxElmts: Int, minPtrs: Int, minElems: Int, pageBits: Int) {
    private def log2(x: Int) = 31 - Integer.numberOfLeadingZeros(x)
    val arrOffSize: Int = (maxBits + 7) / 8
    val pageNelmts: Long = 1L << pageBits
    val nsblks: Int = 1 + (maxBits - log2(minElems))
    val iblkNsblks: Int = 2 * log2(minPtrs)
    val ndblkAddrs: Int = 2 * (minPtrs - 1)
    val nsblkAddrs: Int = nsblks - iblkNsblks
    def ndblks(u: Int): Int = 1 << (u / 2)
    def dblkNelmts(u: Int): Long = (1L << ((u + 1) / 2)) * minElems
    def startIdx(u: Int): Long =
      (0 until u).map(v => ndblks(v) * dblkNelmts(v)).sum
    def dblkPages(u: Int): Int =
      if (dblkNelmts(u) > pageNelmts) (dblkNelmts(u) / pageNelmts).toInt else 0
    def dblkSize(u: Int): Long = {
      val p = dblkPages(u)
      14L + arrOffSize +
        (if (p == 0) dblkNelmts(u) * 8 + 4 else 4L + p * (pageNelmts * 8 + 4))
    }
    def easbSize(u: Int): Long =
      14L + arrOffSize + ndblks(u) * ((dblkPages(u) + 7) / 8).toLong +
        ndblks(u) * 8 + 4
    val eaibSize: Long = 14L + idxElmts * 8 + (ndblkAddrs + nsblkAddrs) * 8 + 4
  }

  /** Like [[writeSonataSpikesV2]] but the datasets declare an UNLIMITED max
    * dimension and are chunked under a v4 layout with an Extensible Array
    * chunk index ("EAHD"/"EAIB"/"EASB"/"EADB") — what h5py emits for an
    * incrementally grown spike log (`maxshape=(None,)`). Default creation
    * parameters match the library's chunk-index defaults; the spec
    * overrides them to force super blocks and paged data blocks at small
    * fixture sizes.
    */
  def writeSonataSpikesEA(
      path: String, population: String,
      timestamps: Array[Double], nodeIds: Array[Long],
      sorting: Int = SortByTime, units: String = "ms",
      chunkRows: Int = 16,
      maxNelmtsBits: Int = 32, idxBlkElmts: Int = 4,
      supBlkMinDataPtrs: Int = 4, dataBlkMinElmts: Int = 16,
      pageBits: Int = 10): Unit = {
    require(timestamps.length == nodeIds.length, "timestamps/node_ids length mismatch")
    require(chunkRows > 0, "EA layout requires chunked storage")
    val n = timestamps.length
    val g = EaGeom(maxNelmtsBits, idxBlkElmts, supBlkMinDataPtrs, dataBlkMinElmts, pageBits)
    val nChunks = (n + chunkRows - 1) / chunkRows
    val chunkBytes = 8L * chunkRows
    val rest = math.max(0, nChunks - g.idxElmts) // elements past the inline ones

    // blocks needed to cover `rest` elements, in element order
    def dblkAllocated(u: Int, d: Int): Boolean = g.startIdx(u) + d * g.dblkNelmts(u) < rest
    val usedSblks = (g.iblkNsblks until g.nsblks).takeWhile(u => g.startIdx(u) < rest)
    val directSize = (0 until g.iblkNsblks).map { u =>
      (0 until g.ndblks(u)).count(dblkAllocated(u, _)) * g.dblkSize(u)
    }.sum
    val superSize = usedSblks.map { u =>
      g.easbSize(u) + (0 until g.ndblks(u)).count(dblkAllocated(u, _)) * g.dblkSize(u)
    }.sum
    val eaRegion = 72L + g.eaibSize + directSize + superSize
    val dataRegion = eaRegion + nChunks * chunkBytes

    def dataspaceUnlimited(len: Long): Array[Byte] = {
      val b = bbuf(20)
      b.put(2.toByte); b.put(1.toByte); b.put(1.toByte); b.put(1.toByte) // v2 rank1 +maxdims
      b.putLong(len)
      b.putLong(-1L) // H5S_UNLIMITED
      b.array()
    }
    def layoutEA(eahd: Long): Array[Byte] = {
      val b = bbuf(27)
      b.put(4.toByte); b.put(2.toByte) // version 4, chunked
      b.put(0.toByte) // flags
      b.put(1.toByte) // rank
      b.put(8.toByte) // dim sizes encoded in 8 bytes
      b.putLong(chunkRows.toLong)
      b.put(4.toByte) // chunk index: extensible array
      // layout-message cparam order: max bits, index elements, min
      // POINTERS, min ELEMENTS, page bits (differs from the EAHD order)
      b.put(maxNelmtsBits.toByte); b.put(idxBlkElmts.toByte)
      b.put(supBlkMinDataPtrs.toByte); b.put(dataBlkMinElmts.toByte)
      b.put(pageBits.toByte)
      b.putLong(eahd)
      b.array()
    }

    val sortAttr = attrMessageV3("sorting", Left(sorting))
    val unitsAttr = attrMessageV3("units", Right(units))
    def rootMsgs(spikes: Long) =
      Seq(0x02 -> linkInfo, 0x0A -> groupInfo, 0x06 -> linkMsg("spikes", spikes))
    def spikesMsgs(pop: Long) =
      Seq(0x02 -> linkInfo, 0x0A -> groupInfo, 0x06 -> linkMsg(population, pop))
    def popMsgs(ids: Long, ts: Long) = Seq(
      0x02 -> linkInfo, 0x0A -> groupInfo,
      0x06 -> linkMsg("node_ids", ids), 0x06 -> linkMsg("timestamps", ts),
      0x0C -> sortAttr)
    def tsMsgs(eahd: Long) = Seq(
      0x01 -> dataspaceUnlimited(n), 0x03 -> dtype64(float = true),
      0x08 -> layoutEA(eahd), 0x0C -> unitsAttr)
    def idsMsgs(eahd: Long) = Seq(
      0x01 -> dataspaceUnlimited(n), 0x03 -> dtype64(float = false),
      0x08 -> layoutEA(eahd))

    val rootOhdr = 48L
    val spikesOhdr = rootOhdr + ohdrSize(rootMsgs(0))
    val popOhdr = spikesOhdr + ohdrSize(spikesMsgs(0))
    val tsOhdr = popOhdr + ohdrSize(popMsgs(0, 0))
    val idsOhdr = tsOhdr + ohdrSize(tsMsgs(0))
    val tsData = idsOhdr + ohdrSize(idsMsgs(0))
    val idsData = tsData + dataRegion
    val eof = idsData + dataRegion
    require(eof <= Int.MaxValue,
      s"writeSonataSpikesEA: $n spikes -> $eof bytes exceeds the 2 GiB " +
        "single-file writer limit; keep spikes in parquet and convert " +
        "per-simulation chunks instead")

    val out = bbuf(eof.toInt)
    superblockV2(out, eof, rootOhdr)
    out.position(rootOhdr.toInt); out.put(ohdrV2(rootMsgs(spikesOhdr)))
    out.position(spikesOhdr.toInt); out.put(ohdrV2(spikesMsgs(popOhdr)))
    out.position(popOhdr.toInt); out.put(ohdrV2(popMsgs(idsOhdr, tsOhdr)))
    out.position(tsOhdr.toInt); out.put(ohdrV2(tsMsgs(tsData)))
    out.position(idsOhdr.toInt); out.put(ohdrV2(idsMsgs(idsData)))

    def cksum(from: Long): Unit = out.putInt(lookup3(
      java.util.Arrays.copyOfRange(out.array(), from.toInt, out.position())))
    def putVarOff(off: Long): Unit =
      (0 until g.arrOffSize).foreach(k => out.put(((off >> (8 * k)) & 0xff).toByte))

    /** EAHD + EAIB + data blocks + super blocks + packed chunks at `at`. */
    def writeExtArray(at: Long, putElem: Long => Unit): Unit = {
      // ---- address layout (sequential after the index block) ----
      val eaibAt = at + 72
      var cursor = eaibAt + g.eaibSize
      val directAddrs = (0 until g.iblkNsblks).flatMap { u =>
        (0 until g.ndblks(u)).map { d =>
          if (dblkAllocated(u, d)) { val a = cursor; cursor += g.dblkSize(u); (u, d, a) }
          else (u, d, -1L)
        }
      }
      val sblkAt = usedSblks.map { u =>
        val a = cursor; cursor += g.easbSize(u)
        val dblks = (0 until g.ndblks(u)).map { d =>
          if (dblkAllocated(u, d)) { val x = cursor; cursor += g.dblkSize(u); x } else -1L
        }
        (u, a, dblks)
      }
      val chunksAt = cursor
      def chunkAddr(i: Long): Long = if (i < nChunks) chunksAt + i * chunkBytes else -1L

      // ---- EAHD ----
      out.position(at.toInt)
      out.putInt(0x44484145) // "EAHD"
      out.put(0.toByte); out.put(0.toByte) // version, client 0 (unfiltered chunks)
      // header cparam order: elmt size, max bits, index elmts, min
      // ELEMENTS, min POINTERS, page bits
      out.put(8.toByte); out.put(maxNelmtsBits.toByte); out.put(idxBlkElmts.toByte)
      out.put(dataBlkMinElmts.toByte); out.put(supBlkMinDataPtrs.toByte)
      out.put(pageBits.toByte)
      out.putLong(usedSblks.length.toLong) // stats: nsuper_blks
      out.putLong(usedSblks.map(g.easbSize).sum) // super_blk_size
      out.putLong(directAddrs.count(_._3 != -1L) +
        sblkAt.map(_._3.count(_ != -1L)).sum.toLong) // ndata_blks
      out.putLong(directSize + sblkAt.map { case (u, _, ds) =>
        ds.count(_ != -1L) * g.dblkSize(u) }.sum) // data_blk_size
      out.putLong(nChunks.toLong) // max_idx_set
      out.putLong(nChunks.toLong) // nelmts
      out.putLong(eaibAt)
      cksum(at)

      // ---- EAIB ----
      out.position(eaibAt.toInt)
      out.putInt(0x42494145) // "EAIB"
      out.put(0.toByte); out.put(0.toByte)
      out.putLong(at)
      (0 until g.idxElmts).foreach(i => out.putLong(chunkAddr(i)))
      directAddrs.foreach { case (_, _, a) => out.putLong(a) }
      val sblkAddrByU = sblkAt.map(s => s._1 -> s._2).toMap
      (g.iblkNsblks until g.nsblks).foreach(u =>
        out.putLong(sblkAddrByU.getOrElse(u, -1L)))
      cksum(eaibAt)

      // ---- data blocks (shared by direct and super-block paths) ----
      // firstElem is the GLOBAL element index of the block's first slot
      // (inline index-block elements included — chunk i is element i)
      def writeDblk(u: Int, dblkAt: Long, firstElem: Long): Unit = {
        val nelmts = g.dblkNelmts(u)
        val p = g.dblkPages(u)
        out.position(dblkAt.toInt)
        out.putInt(0x42444145) // "EADB"
        out.put(0.toByte); out.put(0.toByte)
        out.putLong(at) // header back-pointer (the EAHD address)
        putVarOff(firstElem)
        if (p == 0) {
          (0L until nelmts).foreach(k => out.putLong(chunkAddr(firstElem + k)))
          cksum(dblkAt)
        } else {
          cksum(dblkAt) // paged: the block checksum covers the header only
          (0 until p).foreach { pg =>
            val pStart = out.position().toLong
            (0L until g.pageNelmts).foreach(k =>
              out.putLong(chunkAddr(firstElem + pg * g.pageNelmts + k)))
            cksum(pStart)
          }
        }
      }
      directAddrs.foreach { case (u, d, a) =>
        if (a != -1L)
          writeDblk(u, a, g.idxElmts + g.startIdx(u) + d.toLong * g.dblkNelmts(u))
      }

      // ---- super blocks ----
      sblkAt.foreach { case (u, sAt, dblks) =>
        val p = g.dblkPages(u)
        val perDblkBitmap = (p + 7) / 8
        out.position(sAt.toInt)
        out.putInt(0x42534145) // "EASB"
        out.put(0.toByte); out.put(0.toByte)
        out.putLong(at)
        putVarOff(g.idxElmts + g.startIdx(u))
        // page-init bitmap: all pages of allocated blocks initialized
        // (full bytes 0xFF, remainder in the high bits), zero otherwise
        dblks.foreach { a =>
          (0 until perDblkBitmap).foreach { i =>
            val bitsHere = math.min(8, p - i * 8)
            out.put(if (a == -1L) 0.toByte
              else ((0xff << (8 - bitsHere)) & 0xff).toByte)
          }
        }
        dblks.foreach(out.putLong)
        cksum(sAt)
        dblks.zipWithIndex.foreach { case (a, d) =>
          if (a != -1L)
            writeDblk(u, a, g.idxElmts + g.startIdx(u) + d.toLong * g.dblkNelmts(u))
        }
      }

      // ---- chunk data: full-size chunks, zero padding past n ----
      out.position(chunksAt.toInt)
      (0L until nChunks.toLong * chunkRows).foreach(i =>
        putElem(if (i < n) i else -1L))
    }

    writeExtArray(tsData, i => out.putDouble(if (i < 0) 0.0 else timestamps(i.toInt)))
    writeExtArray(idsData, i => out.putLong(if (i < 0) 0L else nodeIds(i.toInt)))

    val s = new BufferedOutputStream(new FileOutputStream(path))
    try s.write(out.array()) finally s.close()
  }

  // ---- shared v2 building blocks (OHDR headers, messages) ------------------

  private[sources] def bbuf(size: Int) =
    ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)

  private[sources] def linkMsg(name: String, addr: Long): Array[Byte] = {
    val nm = name.getBytes("UTF-8")
    // flags byte 0 declares a 1-byte name length — longer names would
    // silently truncate into a corrupt file, so refuse like the 2 GiB guards
    require(nm.length <= 255,
      s"hdf5 conversion contract: link name '${name.take(32)}…' is ${nm.length} " +
        "UTF-8 bytes; this writer emits 1-byte link-name lengths (max 255)")
    val b = bbuf(3 + nm.length + 8)
    b.put(1.toByte) // version
    b.put(0.toByte) // flags: 1-byte name length, hard link, no extras
    b.put(nm.length.toByte); b.put(nm)
    b.putLong(addr)
    b.array()
  }

  /** Link Info message: compact (no heap) by default; dense groups pass
    * their fractal heap + name-index addresses.
    */
  private[sources] def linkInfoMsg(fheap: Long = -1L, nameBtree: Long = -1L): Array[Byte] = {
    val b = bbuf(18)
    b.put(0.toByte); b.put(0.toByte) // v0, no creation order
    b.putLong(fheap); b.putLong(nameBtree)
    b.array()
  }
  private[sources] def linkInfo: Array[Byte] = linkInfoMsg()
  private[sources] val groupInfo = Array[Byte](0, 0) // v0, no flags

  private[sources] def dataspaceV2(len: Long): Array[Byte] = {
    val b = bbuf(12)
    b.put(2.toByte); b.put(1.toByte); b.put(0.toByte); b.put(1.toByte) // v2 rank1 simple
    b.putLong(len)
    b.array()
  }

  private[sources] def dtype64(float: Boolean): Array[Byte] = {
    val b = bbuf(24)
    if (float) {
      b.put(0x11.toByte); b.put(0x20.toByte); b.put(0x3f.toByte); b.put(0.toByte)
      b.putInt(8); b.putShort(0); b.putShort(64)
      b.put(52.toByte); b.put(11.toByte); b.put(0.toByte); b.put(52.toByte)
      b.putInt(1023); b.putInt(0)
    } else {
      b.put(0x10.toByte); b.put(0x00.toByte); b.put(0.toByte); b.put(0.toByte)
      b.putInt(8); b.putShort(0); b.putShort(64)
      b.putInt(0); b.putInt(0); b.putInt(0)
    }
    b.array()
  }

  private[sources] def layoutC(addr: Long, size: Long): Array[Byte] = {
    val b = bbuf(18)
    b.put(3.toByte); b.put(1.toByte)
    b.putLong(addr); b.putLong(size)
    b.array()
  }

  private[sources] def ohdrV2(msgs: Seq[(Int, Array[Byte])]): Array[Byte] = {
    val msgBytes = msgs.map(4 + _._2.length).sum
    // flags byte 0x01 declares a 2-byte chunk0 size — a bigger message
    // block (e.g. a compact group with very many links) would wrap the
    // short and emit a corrupt file, so refuse with the contract error
    require(msgBytes <= 0xFFFF,
      s"hdf5 conversion contract: object-header message block is $msgBytes " +
        "bytes; this writer emits 2-byte chunk0 sizes (max 65535) — " +
        "use fewer/denser links or split the group")
    val b = bbuf(8 + msgBytes + 4)
    b.putInt(0x5244484f) // "OHDR"
    b.put(2.toByte)
    b.put(0x01.toByte) // flags: 2-byte chunk0 size, no times/order
    b.putShort(msgBytes.toShort)
    msgs.foreach { case (t, body) =>
      b.put(t.toByte); b.putShort(body.length.toShort); b.put(0.toByte)
      b.put(body)
    }
    b.putInt(lookup3(java.util.Arrays.copyOfRange(b.array(), 0, 8 + msgBytes)))
    b.array()
  }
  private[sources] def ohdrSize(msgs: Seq[(Int, Array[Byte])]): Long =
    8L + msgs.map(4 + _._2.length).sum + 4

  private[sources] def superblockV2(out: ByteBuffer, eof: Long, rootOhdr: Long): Unit = {
    out.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
    out.put(2.toByte) // superblock v2
    out.put(8.toByte); out.put(8.toByte) // offset/length sizes
    out.put(0.toByte) // consistency flags
    out.putLong(0L) // base address
    out.putLong(-1L) // superblock extension: none
    out.putLong(eof)
    out.putLong(rootOhdr)
    out.putInt(lookup3(java.util.Arrays.copyOfRange(out.array(), 0, 44)))
  }

  private[sources] def dataspace2d(rows: Long, cols: Long): Array[Byte] = {
    val b = bbuf(20)
    b.put(2.toByte); b.put(2.toByte); b.put(0.toByte); b.put(1.toByte) // v2 rank2 simple
    b.putLong(rows); b.putLong(cols)
    b.array()
  }

  private[sources] def dtypeF32: Array[Byte] = {
    val b = bbuf(20)
    b.put(0x11.toByte) // v1, class 1 (float)
    b.put(0x20.toByte); b.put(0x1f.toByte); b.put(0.toByte) // LE IEEE, sign bit 31
    b.putInt(4)
    b.putShort(0); b.putShort(32) // bit offset / precision
    b.put(23.toByte); b.put(8.toByte) // exponent location / size
    b.put(0.toByte); b.put(23.toByte) // mantissa location / size
    b.putInt(127) // exponent bias
    b.array()
  }

  /** SONATA frame report writer (`/report/<pop>/{data,
    * mapping/{node_ids[, index_pointers, element_ids], time}}`) — the
    * soma/compartment layout bluepysnap reads
    * (adapters/impl/bluepysnap/simulation.py:42-60). `data` is
    * [frame][column] float32; `time` stores the implicit grid
    * (start, stop, step). Lets specs exercise the `sonata-frames` DSv2
    * pushdowns at synthetic scale, and completes two-way frame interop.
    */
  def writeSonataFrames(
      path: String, population: String,
      nodeIds: Array[Long], start: Double, step: Double,
      data: Array[Array[Float]],
      indexPointers: Option[Array[Long]] = None,
      elementIds: Option[Array[Long]] = None): Unit = {
    val nFrames = data.length.toLong
    val nCols = if (data.isEmpty) 0L else data(0).length.toLong
    require(data.forall(_.length == nCols), "ragged frame rows")
    require(indexPointers.forall(_.length == nodeIds.length + 1),
      "index_pointers must have nodeIds.length + 1 entries")
    val timeArr = Array(start, start + nFrames * step, step)

    // datasets: (link name, messages-for-address, byte size, writer)
    case class Ds(name: String, size: Long, msgs: Long => Seq[(Int, Array[Byte])],
        write: (ByteBuffer, Long) => Unit)
    def u64Ds(name: String, vals: Array[Long]) = Ds(
      name, 8L * vals.length,
      a => Seq(0x01 -> dataspaceV2(vals.length), 0x03 -> dtype64(float = false),
        0x08 -> layoutC(a, 8L * vals.length)),
      (out, a) => { out.position(a.toInt); vals.foreach(out.putLong) })
    def f64Ds(name: String, vals: Array[Double]) = Ds(
      name, 8L * vals.length,
      a => Seq(0x01 -> dataspaceV2(vals.length), 0x03 -> dtype64(float = true),
        0x08 -> layoutC(a, 8L * vals.length)),
      (out, a) => { out.position(a.toInt); vals.foreach(out.putDouble) })
    val dataDs = Ds(
      "data", 4L * nFrames * nCols,
      a => Seq(0x01 -> dataspace2d(nFrames, nCols), 0x03 -> dtypeF32,
        0x08 -> layoutC(a, 4L * nFrames * nCols)),
      (out, a) => { out.position(a.toInt); data.foreach(_.foreach(out.putFloat)) })
    val mappingDs = Seq(u64Ds("node_ids", nodeIds)) ++
      indexPointers.map(u64Ds("index_pointers", _)) ++
      elementIds.map(u64Ds("element_ids", _)) ++
      Seq(f64Ds("time", timeArr))

    def groupMsgs(links: Seq[(String, Long)]) =
      Seq(0x02 -> linkInfo, 0x0A -> groupInfo) ++
        links.map { case (nm, a) => 0x06 -> linkMsg(nm, a) }

    // ---- address layout ---------------------------------------------------
    val rootOhdr = 48L
    val reportOhdr = rootOhdr + ohdrSize(groupMsgs(Seq("report" -> 0L)))
    val popOhdr = reportOhdr + ohdrSize(groupMsgs(Seq(population -> 0L)))
    val mappingOhdr = popOhdr +
      ohdrSize(groupMsgs(Seq("data" -> 0L, "mapping" -> 0L)))
    var cursor = mappingOhdr +
      ohdrSize(groupMsgs(mappingDs.map(_.name -> 0L)))
    val placed = (dataDs +: mappingDs).map { ds =>
      val ohdrAt = cursor
      val dataAt = ohdrAt + ohdrSize(ds.msgs(0L))
      cursor = dataAt + ds.size
      (ds, ohdrAt, dataAt)
    }
    val eof = cursor
    require(eof <= Int.MaxValue,
      s"writeSonataFrames: $eof bytes exceeds the 2 GiB single-buffer " +
        "writer limit; frame reports at data scale stay in parquet (README)")

    val out = bbuf(eof.toInt)
    superblockV2(out, eof, rootOhdr)
    def put(at: Long, bytes: Array[Byte]): Unit = {
      out.position(at.toInt); out.put(bytes)
    }
    val byName = placed.map(p => p._1.name -> p).toMap
    put(rootOhdr, ohdrV2(groupMsgs(Seq("report" -> reportOhdr))))
    put(reportOhdr, ohdrV2(groupMsgs(Seq(population -> popOhdr))))
    put(popOhdr, ohdrV2(groupMsgs(
      Seq("data" -> byName("data")._2, "mapping" -> mappingOhdr))))
    put(mappingOhdr, ohdrV2(groupMsgs(
      mappingDs.map(ds => ds.name -> byName(ds.name)._2))))
    placed.foreach { case (ds, ohdrAt, dataAt) =>
      put(ohdrAt, ohdrV2(ds.msgs(dataAt)))
      ds.write(out, dataAt)
    }

    val s = new BufferedOutputStream(new FileOutputStream(path))
    try s.write(out.array()) finally s.close()
  }

  /** Legacy BBP frame report (the pre-SONATA flat layout bluepy reads,
    * reference via adapters/impl/bluepy/simulation.py:39-51): root-level
    * `/data` [n_frames × n_cols] float32 plus `/mapping/{gids,
    * index_pointer, element_id, time}` — gids are 1-based bluepy GIDs,
    * `index_pointer` holds per-gid column START offsets only (length ==
    * nGids; run k ends at the next start, the last at n_cols), and
    * `time` is the `(start, stop, step)` triple. Used by the bluepy-tier
    * campaign cross-checks; matches the shape of the reference's own
    * tests/unit/data/simulation/bbp/reporting/soma.h5 fixture.
    */
  def writeBbpReport(
      path: String, gids: Array[Long], start: Double, step: Double,
      data: Array[Array[Float]],
      indexPointer: Option[Array[Long]] = None,
      elementId: Option[Array[Long]] = None): Unit = {
    val nFrames = data.length.toLong
    val nCols = if (data.isEmpty) 0L else data(0).length.toLong
    require(data.forall(_.length == nCols), "ragged frame rows")
    require(indexPointer.forall(_.length == gids.length),
      "legacy index_pointer holds start offsets only: length == gids.length")
    val timeArr = Array(start, start + nFrames * step, step)

    case class Ds(name: String, size: Long, msgs: Long => Seq[(Int, Array[Byte])],
        write: (ByteBuffer, Long) => Unit)
    def u64Ds(name: String, vals: Array[Long]) = Ds(
      name, 8L * vals.length,
      a => Seq(0x01 -> dataspaceV2(vals.length), 0x03 -> dtype64(float = false),
        0x08 -> layoutC(a, 8L * vals.length)),
      (out, a) => { out.position(a.toInt); vals.foreach(out.putLong) })
    def f64Ds(name: String, vals: Array[Double]) = Ds(
      name, 8L * vals.length,
      a => Seq(0x01 -> dataspaceV2(vals.length), 0x03 -> dtype64(float = true),
        0x08 -> layoutC(a, 8L * vals.length)),
      (out, a) => { out.position(a.toInt); vals.foreach(out.putDouble) })
    val dataDs = Ds(
      "data", 4L * nFrames * nCols,
      a => Seq(0x01 -> dataspace2d(nFrames, nCols), 0x03 -> dtypeF32,
        0x08 -> layoutC(a, 4L * nFrames * nCols)),
      (out, a) => { out.position(a.toInt); data.foreach(_.foreach(out.putFloat)) })
    val mappingDs = Seq(u64Ds("gids", gids)) ++
      indexPointer.map(u64Ds("index_pointer", _)) ++
      elementId.map(u64Ds("element_id", _)) ++
      Seq(f64Ds("time", timeArr))

    def groupMsgs(links: Seq[(String, Long)]) =
      Seq(0x02 -> linkInfo, 0x0A -> groupInfo) ++
        links.map { case (nm, a) => 0x06 -> linkMsg(nm, a) }

    val rootOhdr = 48L
    val mappingOhdr = rootOhdr +
      ohdrSize(groupMsgs(Seq("data" -> 0L, "mapping" -> 0L)))
    var cursor = mappingOhdr +
      ohdrSize(groupMsgs(mappingDs.map(_.name -> 0L)))
    val placed = (dataDs +: mappingDs).map { ds =>
      val ohdrAt = cursor
      val dataAt = ohdrAt + ohdrSize(ds.msgs(0L))
      cursor = dataAt + ds.size
      (ds, ohdrAt, dataAt)
    }
    val eof = cursor
    require(eof <= Int.MaxValue,
      s"writeBbpReport: $eof bytes exceeds the 2 GiB single-buffer " +
        "writer limit; frame reports at data scale stay in parquet (README)")

    val out = bbuf(eof.toInt)
    superblockV2(out, eof, rootOhdr)
    def put(at: Long, bytes: Array[Byte]): Unit = {
      out.position(at.toInt); out.put(bytes)
    }
    val byName = placed.map(p => p._1.name -> p).toMap
    put(rootOhdr, ohdrV2(groupMsgs(
      Seq("data" -> byName("data")._2, "mapping" -> mappingOhdr))))
    put(mappingOhdr, ohdrV2(groupMsgs(
      mappingDs.map(ds => ds.name -> byName(ds.name)._2))))
    placed.foreach { case (ds, ohdrAt, dataAt) =>
      put(ohdrAt, ohdrV2(ds.msgs(dataAt)))
      ds.write(out, dataAt)
    }

    val s = new BufferedOutputStream(new FileOutputStream(path))
    try s.write(out.array()) finally s.close()
  }

  /** Fixture writer for DENSE groups (h5py libver='latest' past 8 links):
    * the root group stores its links in a fractal heap indexed by a
    * link-name v2 B-tree; each link points at a small contiguous u64
    * dataset. Exists to pin `Hdf5File.denseLinks` against real on-disk
    * instances of the structures. With the default geometry and few
    * links the heap is one root DIRECT block and the B-tree a single
    * leaf; shrinking `startBlockSize`/`maxDirectBlockSize`/`btNodeSize`
    * forces root INDIRECT blocks, nested indirect rows past
    * maxDirectRows, and a depth-1 B-tree (internal "BTIN" root) at
    * fixture sizes — the shapes a large h5py dense group produces.
    */
  def writeDenseGroupFixture(
      path: String, datasets: Seq[(String, Array[Long])],
      startBlockSize: Int = 4096, maxDirectBlockSize: Int = 65536,
      tableWidth: Int = 4, btNodeSize: Int = 512): Unit = {
    require(datasets.nonEmpty)
    val names = datasets.map(_._1)
    // heap geometry: 32-bit heap offsets, 4096-max objects → 7-byte ids
    val OffSize = 4; val LenSize = 2
    val heapIdLen = 1 + OffSize + LenSize
    val recordSize = 4 + heapIdLen
    val DbHeader = 4 + 1 + 8 + OffSize // FHDB header (unchecksummed blocks)

    def dsMsgs(name: String, data: Long) = {
      val n = datasets.find(_._1 == name).get._2.length
      Seq(0x01 -> dataspaceV2(n), 0x03 -> dtype64(float = false),
        0x08 -> layoutC(data, 8L * n))
    }
    // layout: superblock, root OHDR, per-dataset (OHDR + data), FRHP,
    // direct blocks in heap order, nested FHIBs, root FHIB, B-tree nodes
    val rootMsgs0 = Seq(0x02 -> linkInfoMsg(0L, 0L), 0x0A -> groupInfo)
    val rootOhdr = 48L
    var cursor = rootOhdr + ohdrSize(rootMsgs0)
    val dsAddrs = datasets.map { case (name, vals) =>
      val ohdrAt = cursor
      val dataAt = ohdrAt + ohdrSize(dsMsgs(name, 0))
      cursor = dataAt + 8L * vals.length
      (name, ohdrAt, dataAt)
    }
    val linkBodies = dsAddrs.map { case (name, ohdrAt, _) => linkMsg(name, ohdrAt) }

    // ---- pack link bodies into doubling-table direct blocks ----
    def log2(x: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(x)
    require(Integer.bitCount(startBlockSize) == 1 &&
      Integer.bitCount(maxDirectBlockSize) == 1 &&
      Integer.bitCount(tableWidth) == 1 && maxDirectBlockSize >= startBlockSize,
      "heap geometry must be powers of two")
    val maxDirectRows = log2(maxDirectBlockSize) - log2(startBlockSize) + 2
    def rowBlockSize(r: Int): Long =
      if (r < 2) startBlockSize.toLong else startBlockSize.toLong << (r - 1)
    def rowStart(r: Int): Long =
      (0 until r).map(q => tableWidth * rowBlockSize(q)).sum
    // direct-block slots in heap order; key = (root row, root col,
    // nested row, nested col); nested rows expand one level (fixture
    // scope — the reader recurses arbitrarily)
    case class Slot(rr: Int, rc: Int, nr: Int, nc: Int, heapOff: Long, size: Long)
    def slots: Iterator[Slot] = Iterator.from(0).flatMap { r =>
      (0 until tableWidth).iterator.flatMap { c =>
        val base = rowStart(r) + c * rowBlockSize(r)
        if (r < maxDirectRows) Iterator(Slot(r, c, -1, -1, base, rowBlockSize(r)))
        else {
          val childRows = log2(rowBlockSize(r)) - log2(startBlockSize.toLong * tableWidth) + 1
          require(childRows <= maxDirectRows,
            "fixture geometry would doubly nest indirect blocks")
          (0 until childRows).iterator.flatMap { cr =>
            (0 until tableWidth).iterator.map { cc =>
              Slot(r, c, cr, cc,
                base + rowStart(cr) + cc * rowBlockSize(cr), rowBlockSize(cr))
            }
          }
        }
      }
    }
    // greedy fill: body i → first slot with room; bodies are far smaller
    // than a block so every slot up to the last is used
    val slotIt = slots
    val used = scala.collection.mutable.ArrayBuffer.empty[(Slot, scala.collection.mutable.ArrayBuffer[Int])]
    val heapOffsets = new Array[Long](linkBodies.length)
    for (i <- linkBodies.indices) {
      val len = linkBodies(i).length
      require(len <= startBlockSize - DbHeader, s"link body $len too big for a block")
      if (used.isEmpty ||
          heapOffsets(used.last._2.last) + linkBodies(used.last._2.last).length + len >
            used.last._1.heapOff + used.last._1.size) {
        used += ((slotIt.next(), scala.collection.mutable.ArrayBuffer.empty[Int]))
        heapOffsets(i) = used.last._1.heapOff + DbHeader
      } else {
        heapOffsets(i) = heapOffsets(used.last._2.last) + linkBodies(used.last._2.last).length
      }
      used.last._2 += i
    }
    val rootDirect = used.length == 1 && used.head._1.rr == 0
    val curRows = if (rootDirect) 0 else used.map(s => s._1.rr).max + 1
    val usedNested = used.map(_._1).filter(_.nr >= 0).map(s => (s.rr, s.rc)).distinct

    // ---- file layout past the datasets ----
    val fheapAt = cursor
    cursor += 146
    val blockFileAt = used.map { case (s, bodies) =>
      val at = cursor
      cursor += DbHeader + bodies.map(linkBodies(_).length).sum
      ((s.rr, s.rc, s.nr, s.nc), at)
    }.toMap
    def fhibSize(nrows: Int): Long = 4 + 1 + 8 + OffSize + nrows.toLong * tableWidth * 8 + 4
    val nestedAt = usedNested.map { case (rr, rc) =>
      val childRows = log2(rowBlockSize(rr)) - log2(startBlockSize.toLong * tableWidth) + 1
      val at = cursor; cursor += fhibSize(childRows); ((rr, rc), (at, childRows))
    }.toMap
    val rootFhibAt = if (rootDirect) -1L else { val a = cursor; cursor += fhibSize(curRows); a }
    val heapRootAddr = if (rootDirect) blockFileAt(used.head._1.rr, used.head._1.rc, -1, -1) else rootFhibAt

    // ---- B-tree shape: depth 0 (single leaf) or depth 1 ----
    val sortedRecs = names.zipWithIndex.map { case (nm, i) =>
      (lookup3(nm.getBytes("UTF-8")) & 0xffffffffL, i)
    }.sortBy(_._1)
    val leafMax = (btNodeSize - 10) / recordSize
    val maxNRecSize = log2(leafMax.toLong) / 8 + 1
    val depth1 = sortedRecs.length > leafMax
    // smallest leaf count whose leaves hold all records minus separators
    val nLeaves =
      if (!depth1) 1 else ((sortedRecs.length + 1) + leafMax) / (leafMax + 1)
    val ptrSize = 8 + maxNRecSize
    val intMax = (btNodeSize - 10 - ptrSize) / (recordSize + ptrSize)
    require(nLeaves - 1 <= intMax,
      s"fixture needs B-tree depth 2 (${sortedRecs.length} links, node $btNodeSize)")
    // leaves get even shares of (records - separators)
    val leafRecs: Seq[Seq[(Long, Int)]] =
      if (!depth1) Seq(sortedRecs)
      else {
        val total = sortedRecs.length - (nLeaves - 1)
        val base = total / nLeaves; val rem = total % nLeaves
        val sizes = (0 until nLeaves).map(i => base + (if (i < rem) 1 else 0))
        val out = Seq.newBuilder[Seq[(Long, Int)]]
        var pos = 0
        for (s <- sizes) { out += sortedRecs.slice(pos, pos + s); pos += s + 1 }
        out.result()
      }
    val separators = // record after each leaf's share
      if (!depth1) Nil
      else leafRecs.init.scanLeft(0)((p, l) => p + l.length + 1).zip(leafRecs.init)
        .map { case (start, l) => sortedRecs(start + l.length) }
    val bthdAt = cursor; cursor += 38
    val leafAt = leafRecs.map { l => val a = cursor; cursor += 6L + l.length * recordSize + 4; a }
    val intAt = if (depth1) { val a = cursor; cursor += 6L + separators.length * recordSize + nLeaves.toLong * ptrSize + 4; a } else -1L
    val eof = cursor

    val out = bbuf(eof.toInt)
    superblockV2(out, eof, rootOhdr)
    out.position(rootOhdr.toInt)
    out.put(ohdrV2(Seq(0x02 -> linkInfoMsg(fheapAt, bthdAt), 0x0A -> groupInfo)))
    for (((name, ohdrAt, dataAt), (_, vals)) <- dsAddrs.zip(datasets)) {
      out.position(ohdrAt.toInt)
      out.put(ohdrV2(dsMsgs(name, dataAt)))
      out.position(dataAt.toInt)
      vals.foreach(out.putLong)
    }
    def cksumFrom(start: Long): Unit = out.putInt(lookup3(
      java.util.Arrays.copyOfRange(out.array(), start.toInt, out.position())))
    // ---- fractal heap header ----
    val managed = used.map { case (s, bodies) =>
      DbHeader.toLong + bodies.map(linkBodies(_).length).sum }.sum
    out.position(fheapAt.toInt)
    out.putInt(0x50485246) // "FRHP"
    out.put(0.toByte)
    out.putShort(heapIdLen.toShort)
    out.putShort(0) // no I/O filters
    out.put(0.toByte) // flags: direct blocks not checksummed
    out.putInt(4096) // max managed object size
    out.putLong(0L); out.putLong(-1L) // next huge id / huge btree
    out.putLong(0L); out.putLong(-1L) // free space / manager
    out.putLong(managed); out.putLong(managed) // managed / allocated space
    out.putLong(managed) // iterator offset
    out.putLong(names.length.toLong) // managed objects
    out.putLong(0L); out.putLong(0L); out.putLong(0L); out.putLong(0L) // huge/tiny
    out.putShort(tableWidth.toShort)
    out.putLong(startBlockSize.toLong)
    out.putLong(maxDirectBlockSize.toLong)
    out.putShort(32) // max heap size (bits)
    out.putShort(if (rootDirect) 0 else 1) // starting rows in root indirect
    out.putLong(heapRootAddr)
    out.putShort(curRows.toShort) // 0 → root is DIRECT
    cksumFrom(fheapAt)
    // ---- direct blocks + link bodies ----
    for ((s, bodies) <- used) {
      out.position(blockFileAt((s.rr, s.rc, s.nr, s.nc)).toInt)
      out.putInt(0x42444846) // "FHDB"
      out.put(0.toByte)
      out.putLong(fheapAt)
      (0 until OffSize).foreach(k => out.put(((s.heapOff >> (8 * k)) & 0xff).toByte))
      bodies.foreach(i => out.put(linkBodies(i)))
    }
    // ---- indirect blocks: nested tables first, then the root ----
    def writeFhib(at: Long, blockOff: Long, nrows: Int,
        child: (Int, Int) => Long): Unit = {
      out.position(at.toInt)
      out.putInt(0x42494846) // "FHIB"
      out.put(0.toByte)
      out.putLong(fheapAt)
      (0 until OffSize).foreach(k => out.put(((blockOff >> (8 * k)) & 0xff).toByte))
      for (r <- 0 until nrows; c <- 0 until tableWidth) out.putLong(child(r, c))
      cksumFrom(at)
    }
    for (((rr, rc), (at, childRows)) <- nestedAt.toSeq.sortBy(_._2._1)) {
      val base = rowStart(rr) + rc * rowBlockSize(rr)
      writeFhib(at, base, childRows,
        (r, c) => blockFileAt.getOrElse((rr, rc, r, c), -1L))
    }
    if (!rootDirect) writeFhib(rootFhibAt, 0L, curRows, (r, c) =>
      if (r < maxDirectRows) blockFileAt.getOrElse((r, c, -1, -1), -1L)
      else nestedAt.get((r, c)).map(_._1).getOrElse(-1L))
    // ---- link-name v2 B-tree ----
    out.position(bthdAt.toInt)
    out.putInt(0x44485442) // "BTHD"
    out.put(0.toByte)
    out.put(5.toByte) // type: link-name index
    out.putInt(btNodeSize)
    out.putShort(recordSize.toShort)
    out.putShort(if (depth1) 1 else 0)
    out.put(100.toByte); out.put(40.toByte) // split / merge percent
    out.putLong(if (depth1) intAt else leafAt.head)
    out.putShort((if (depth1) separators.length else sortedRecs.length).toShort)
    out.putLong(sortedRecs.length.toLong)
    cksumFrom(bthdAt)
    def putRecord(rec: (Long, Int)): Unit = {
      out.putInt(rec._1.toInt)
      out.put(0.toByte) // managed heap id, version 0
      val off = heapOffsets(rec._2)
      (0 until OffSize).foreach(k => out.put(((off >> (8 * k)) & 0xff).toByte))
      val len = linkBodies(rec._2).length.toLong
      (0 until LenSize).foreach(k => out.put(((len >> (8 * k)) & 0xff).toByte))
    }
    for ((recs, at) <- leafRecs.zip(leafAt)) {
      out.position(at.toInt)
      out.putInt(0x464c5442) // "BTLF"
      out.put(0.toByte)
      out.put(5.toByte)
      recs.foreach(putRecord)
      cksumFrom(at)
    }
    if (depth1) {
      out.position(intAt.toInt)
      out.putInt(0x4e495442) // "BTIN"
      out.put(0.toByte)
      out.put(5.toByte)
      separators.foreach(putRecord)
      for (i <- 0 until nLeaves) {
        out.putLong(leafAt(i))
        val n = leafRecs(i).length.toLong
        (0 until maxNRecSize).foreach(k => out.put(((n >> (8 * k)) & 0xff).toByte))
      }
      cksumFrom(intAt)
    }

    val s = new BufferedOutputStream(new FileOutputStream(path))
    try s.write(out.array()) finally s.close()
  }

  /** Jenkins lookup3 ("hashlittle") — the checksum HDF5 stores after
    * superblock v2 and each v2 object-header chunk (public-domain
    * algorithm; HDF5 calls it with initval 0).
    */
  private[sources] def lookup3(data: Array[Byte], init: Int = 0): Int = {
    def rot(x: Int, k: Int): Int = (x << k) | (x >>> (32 - k))
    def word(off: Int, nb: Int): Int = {
      var v = 0; var j = 0
      while (j < nb && off + j < data.length) {
        v |= (data(off + j) & 0xff) << (8 * j); j += 1
      }
      v
    }
    var a = 0xdeadbeef + data.length + init
    var b = a; var c = a
    var i = 0; var len = data.length
    while (len > 12) {
      a += word(i, 4); b += word(i + 4, 4); c += word(i + 8, 4)
      a -= c; a ^= rot(c, 4); c += b
      b -= a; b ^= rot(a, 6); a += c
      c -= b; c ^= rot(b, 8); b += a
      a -= c; a ^= rot(c, 16); c += b
      b -= a; b ^= rot(a, 19); a += c
      c -= b; c ^= rot(b, 4); b += a
      i += 12; len -= 12
    }
    if (len > 0) {
      a += word(i, math.min(len, 4))
      if (len > 4) b += word(i + 4, math.min(len - 4, 4))
      if (len > 8) c += word(i + 8, math.min(len - 8, 4))
      c ^= b; c -= rot(b, 14)
      a ^= c; a -= rot(c, 11)
      b ^= a; b -= rot(a, 25)
      c ^= b; c -= rot(b, 16)
      a ^= c; a -= rot(c, 4)
      b ^= a; b -= rot(a, 14)
      c ^= b; c -= rot(b, 24)
    }
    c
  }

  // ---- v3 attribute message (unpadded, charset byte) ----------------------

  private def attrMessageV3(name: String, value: Either[Int, String]): Array[Byte] = {
    val nameRaw = name.getBytes("UTF-8") :+ 0.toByte
    val (dtRaw, dataRaw) = attrParts(value)
    val ds = Array[Byte](2, 0, 0, 0) // v2 scalar dataspace: v, rank 0, flags, type
    val head = ByteBuffer.allocate(9).order(ByteOrder.LITTLE_ENDIAN)
    head.put(3.toByte); head.put(0.toByte)
    head.putShort(nameRaw.length.toShort)
    head.putShort(dtRaw.length.toShort)
    head.putShort(ds.length.toShort)
    head.put(0.toByte) // charset: ASCII
    head.array() ++ nameRaw ++ dtRaw ++ ds ++ dataRaw
  }

  // ---- v1 attribute message (8-padded name/datatype/dataspace blocks) -----

  private def padArr(b: Array[Byte]): Array[Byte] =
    b ++ new Array[Byte]((8 - b.length % 8) % 8)

  private def attrMessage(name: String, value: Either[Int, String]): Array[Byte] = {
    val nameRaw = name.getBytes("UTF-8") :+ 0.toByte
    val (dtRaw, dataRaw) = attrParts(value)
    val ds = Array[Byte](1, 0, 0, 0, 0, 0, 0, 0) // v1 scalar dataspace
    val head = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    head.put(1.toByte); head.put(0.toByte)
    head.putShort(nameRaw.length.toShort)
    head.putShort(dtRaw.length.toShort)
    head.putShort(ds.length.toShort)
    padArr(head.array() ++ padArr(nameRaw) ++ padArr(dtRaw) ++ padArr(ds) ++ dataRaw)
  }

  private def attrParts(value: Either[Int, String]): (Array[Byte], Array[Byte]) =
    value match {
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
}
