package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** S8 round trip: Hdf5Writer's SONATA spike files read back through every
  * consumer tier — the raw Hdf5File reader (itself pinned byte-level
  * against genuine h5py files in Hdf5Spec), the sonata-spikes DSv2 source
  * with its pushdowns, and the SonataAdapter.
  */
class Hdf5WriterSpec extends SparkSuite {

  private val ts = Array(0.5, 1.25, 2.0, 2.0, 7.75)
  private val ids = Array(3L, 1L, 4L, 1L, 0L)

  private def written(): String = {
    val p = java.nio.file.Files.createTempDirectory("graft-h5w").resolve("spikes.h5")
    Hdf5Writer.writeSonataSpikes(p.toString, "synthetic", ts, ids)
    p.toString
  }

  test("raw reader round trip: values, attrs, structure") {
    val h5 = new Hdf5File(written())
    try {
      assert(h5.ls("/spikes") === Seq("synthetic"))
      assert(h5.ls("/spikes/synthetic") === Seq("node_ids", "timestamps"))
      assert(h5.attr("/spikes/synthetic", "sorting").contains(2.0))
      assert(h5.attr("/spikes/synthetic/timestamps", "units").contains("ms"))
      assert(h5.readDoubles("/spikes/synthetic/timestamps").toSeq === ts.toSeq)
      assert(h5.readLongs("/spikes/synthetic/node_ids").toSeq === ids.toSeq)
      // element-range reads hold on written files too
      assert(h5.readDoubles("/spikes/synthetic/timestamps", 1, 3).toSeq === Seq(1.25, 2.0))
    } finally h5.close()
  }

  test("DSv2 source reads written files with time pushdown") {
    val df = spark.read.format("sonata-spikes")
      .option("rowsPerPartition", "1")
      .load(written())
      .filter(col("time") >= 1.0 && col("time") < 3.0)
    // by_time sort is declared by the writer → binary-search narrowing
    assert(df.rdd.getNumPartitions === 3)
    assert(df.collect().map(r => (r.getDouble(1), r.getLong(2))).toSet ===
      Set((1.25, 1L), (2.0, 4L), (2.0, 1L)))
  }

  test("SonataAdapter consumes writer output directly") {
    val sp = new graft.engine.SonataAdapter().spikes(spark, written())
    assert(sp.count() === 5)
    assert(sp.agg(min("time"), max("gid")).collect()(0).toSeq === Seq(0.5, 4L))
  }

  private def writtenV2(): String = {
    val p = java.nio.file.Files.createTempDirectory("graft-h5w2").resolve("spikes_v2.h5")
    Hdf5Writer.writeSonataSpikesV2(p.toString, "synthetic", ts, ids)
    p.toString
  }

  test("superblock v2 + OHDR v2 file (libver='latest' layer) reads identically") {
    val p = writtenV2()
    // the on-disk structures really are the modern ones
    val head = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    assert(head(8) === 2.toByte, "superblock version must be 2")
    assert(new String(head.slice(48, 52), "ASCII") === "OHDR")
    val h5 = new Hdf5File(p)
    try {
      assert(h5.ls("/spikes") === Seq("synthetic"))
      assert(h5.ls("/spikes/synthetic") === Seq("node_ids", "timestamps"))
      assert(h5.attr("/spikes/synthetic", "sorting").contains(2.0))
      assert(h5.attr("/spikes/synthetic/timestamps", "units").contains("ms"))
      assert(h5.readDoubles("/spikes/synthetic/timestamps").toSeq === ts.toSeq)
      assert(h5.readLongs("/spikes/synthetic/node_ids").toSeq === ids.toSeq)
      assert(h5.readDoubles("/spikes/synthetic/timestamps", 1, 3).toSeq === Seq(1.25, 2.0))
    } finally h5.close()
    // both writer modes must decode to the same rows
    val v0 = new Hdf5File(written())
    val v2 = new Hdf5File(p)
    try {
      assert(v0.readDoubles("/spikes/synthetic/timestamps").toSeq ===
        v2.readDoubles("/spikes/synthetic/timestamps").toSeq)
      assert(v0.readLongs("/spikes/synthetic/node_ids").toSeq ===
        v2.readLongs("/spikes/synthetic/node_ids").toSeq)
    } finally { v0.close(); v2.close() }
  }

  test("DSv2 source applies time pushdown on a v2-superblock file") {
    val df = spark.read.format("sonata-spikes")
      .option("rowsPerPartition", "1")
      .load(writtenV2())
      .filter(col("time") >= 1.0 && col("time") < 3.0)
    assert(df.rdd.getNumPartitions === 3) // by_time binary-search narrowing
    assert(df.collect().map(r => (r.getDouble(1), r.getLong(2))).toSet ===
      Set((1.25, 1L), (2.0, 4L), (2.0, 1L)))
  }

  test("v4 chunked layout: fixed-array index, non-paged and paged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5w4")
    // 5 rows / chunkRows 3 → 2 chunks, one 4-entry page: non-paged FADB
    val np = dir.resolve("nonpaged.h5").toString
    Hdf5Writer.writeSonataSpikesV2(np, "synthetic", ts, ids, chunkRows = 3)
    // 5 rows / chunkRows 1 → 5 chunks > 4/page: PAGED fixed array
    val pg = dir.resolve("paged.h5").toString
    Hdf5Writer.writeSonataSpikesV2(pg, "synthetic", ts, ids, chunkRows = 1)
    for (p <- Seq(np, pg)) {
      val h5 = new Hdf5File(p)
      try {
        assert(h5.readDoubles("/spikes/synthetic/timestamps").toSeq === ts.toSeq)
        assert(h5.readLongs("/spikes/synthetic/node_ids").toSeq === ids.toSeq)
        // element-range reads cross chunk boundaries
        assert(h5.readDoubles("/spikes/synthetic/timestamps", 2, 5).toSeq ===
          ts.slice(2, 5).toSeq)
        assert(h5.readLongs("/spikes/synthetic/node_ids", 1, 4).toSeq ===
          ids.slice(1, 4).toSeq)
      } finally h5.close()
    }
    // and the DSv2 source's binary-search pushdown still works on chunks
    val df = spark.read.format("sonata-spikes").load(pg)
      .filter(col("time") >= 1.0 && col("time") < 3.0)
    assert(df.collect().map(r => (r.getDouble(1), r.getLong(2))).toSet ===
      Set((1.25, 1L), (2.0, 4L), (2.0, 1L)))
  }

  test("v4 chunked layout: extensible-array index (unlimited maxshape)") {
    // default library cparams (idx 4, minPtrs 4, minElems 16): 500 rows /
    // chunkRows 2 → 250 chunks = 4 inline + 240 across the six
    // index-block-direct data blocks + 6 more in super block u=4 — every
    // structural tier short of paging is on the read path
    val n = 500
    val ts2 = Array.tabulate(n)(_ * 0.5)
    val ids2 = Array.tabulate(n)(i => (i % 7).toLong)
    val dir = java.nio.file.Files.createTempDirectory("graft-h5ea")
    val p = dir.resolve("ea.h5").toString
    Hdf5Writer.writeSonataSpikesEA(p, "synthetic", ts2, ids2, chunkRows = 2)
    val bytes = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "ISO-8859-1")
    for (sig <- Seq("EAHD", "EAIB", "EASB", "EADB"))
      assert(bytes.contains(sig), s"file should contain an $sig block")
    val h5 = new Hdf5File(p)
    try {
      assert(h5.dims("/spikes/synthetic/timestamps") === Seq(n.toLong))
      assert(h5.readDoubles("/spikes/synthetic/timestamps").toSeq === ts2.toSeq)
      assert(h5.readLongs("/spikes/synthetic/node_ids").toSeq === ids2.toSeq)
      // ranges crossing the inline→direct boundary (element 8) and into
      // the super-block region (element 488)
      assert(h5.readDoubles("/spikes/synthetic/timestamps", 7, 13).toSeq ===
        ts2.slice(7, 13).toSeq)
      assert(h5.readLongs("/spikes/synthetic/node_ids", 486, 500).toSeq ===
        ids2.slice(486, 500).toSeq)
    } finally h5.close()
    // the engine reads the grown-log format end-to-end
    val df = spark.read.format("sonata-spikes").load(p)
      .filter(col("time") >= 4.0 && col("time") < 6.0)
    assert(df.count() === 4)
  }

  test("extensible array: PAGED data blocks inside a super block") {
    // shrunk cparams (minPtrs 2, minElems 4, pageBits 3 → 8-element
    // pages): super block u=3 holds 16-element data blocks split into two
    // pages each, exercising the paged element walk + page-init bitmap
    val n = 52
    val ts2 = Array.tabulate(n)(_ * 1.5)
    val ids2 = Array.tabulate(n)(i => (i % 5).toLong)
    val dir = java.nio.file.Files.createTempDirectory("graft-h5eap")
    val p = dir.resolve("ea_paged.h5").toString
    Hdf5Writer.writeSonataSpikesEA(p, "synthetic", ts2, ids2, chunkRows = 1,
      supBlkMinDataPtrs = 2, dataBlkMinElmts = 4, pageBits = 3)
    val h5 = new Hdf5File(p)
    try {
      assert(h5.readDoubles("/spikes/synthetic/timestamps").toSeq === ts2.toSeq)
      assert(h5.readLongs("/spikes/synthetic/node_ids").toSeq === ids2.toSeq)
      // ranges landing inside the paged blocks (elements 28+ live in u=3)
      assert(h5.readDoubles("/spikes/synthetic/timestamps", 30, 49).toSeq ===
        ts2.slice(30, 49).toSeq)
    } finally h5.close()
  }

  test("dense (fractal-heap) group: 12 links through heap + name B-tree") {
    // h5py libver='latest' switches groups from compact links to dense
    // storage past 8 links — a node table with many properties hits this
    val dir = java.nio.file.Files.createTempDirectory("graft-h5dense")
    val p = dir.resolve("dense.h5").toString
    val sets = (0 until 12).map(i => (s"prop$i", Array(i.toLong, i * 10L, i * 100L)))
    Hdf5Writer.writeDenseGroupFixture(p, sets)
    val h5 = new Hdf5File(p)
    try {
      assert(h5.ls("/") === (0 until 12).map(i => s"prop$i").sorted)
      for ((name, vals) <- sets) {
        assert(h5.readLongs(s"/$name").toSeq === vals.toSeq, s"dataset $name")
        assert(h5.dims(s"/$name") === Seq(3L))
      }
      assert(h5.exists("/prop7") && !h5.exists("/prop12"))
    } finally h5.close()
  }

  /** Occurrences of a 4-byte structure signature in the file — proves a
    * fixture actually contains the shape the test claims to exercise.
    */
  private def countSig(p: String, sig: String): Int = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    val s = sig.getBytes("US-ASCII")
    (0 to bytes.length - 4).count(i =>
      bytes(i) == s(0) && bytes(i + 1) == s(1) && bytes(i + 2) == s(2) && bytes(i + 3) == s(3))
  }

  test("dense group at 120 links: root INDIRECT heap + depth-1 name B-tree") {
    // shrunken doubling-table geometry so fixture-size groups produce the
    // multi-block shapes of a real many-thousand-link h5py dense group
    val dir = java.nio.file.Files.createTempDirectory("graft-h5dense-ind")
    val p = dir.resolve("dense_ind.h5").toString
    val sets = (0 until 120).map(i => (f"prop$i%03d", Array(i.toLong, i * 7L)))
    Hdf5Writer.writeDenseGroupFixture(p, sets,
      startBlockSize = 512, maxDirectBlockSize = 1024, btNodeSize = 512)
    assert(countSig(p, "FHIB") === 1, "expected a root indirect block")
    assert(countSig(p, "FHDB") >= 3, "expected several direct blocks")
    assert(countSig(p, "BTIN") === 1, "expected a depth-1 B-tree root")
    assert(countSig(p, "BTLF") >= 2, "expected several B-tree leaves")
    val h5 = new Hdf5File(p)
    try {
      assert(h5.ls("/") === sets.map(_._1).sorted)
      for ((name, vals) <- sets)
        assert(h5.readLongs(s"/$name").toSeq === vals.toSeq, s"dataset $name")
    } finally h5.close()
  }

  test("dense group at 600 links: NESTED indirect rows past maxDirectRows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5dense-nest")
    val p = dir.resolve("dense_nest.h5").toString
    val sets = (0 until 600).map(i => (f"p$i%03d", Array(i.toLong)))
    Hdf5Writer.writeDenseGroupFixture(p, sets,
      startBlockSize = 512, maxDirectBlockSize = 1024, btNodeSize = 512)
    // root indirect + at least one child indirect block in a row >= maxDirectRows
    assert(countSig(p, "FHIB") >= 2, "expected root + nested indirect blocks")
    assert(countSig(p, "BTIN") === 1)
    val h5 = new Hdf5File(p)
    try {
      assert(h5.ls("/").length === 600)
      assert(h5.readLongs("/p000").toSeq === Seq(0L))
      assert(h5.readLongs("/p599").toSeq === Seq(599L))
      assert(h5.readLongs("/p311").toSeq === Seq(311L))
      assert(h5.exists("/p042") && !h5.exists("/p600"))
    } finally h5.close()
  }

  test("v2 B-tree chunk index, depth 0: values and ranges round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5bt0")
    val p = dir.resolve("bt0.h5").toString
    Hdf5Writer.writeSonataSpikesBT(p, "synthetic", ts, ids, chunkRows = 2)
    assert(countSig(p, "BTHD") === 2 && countSig(p, "BTIN") === 0)
    val h5 = new Hdf5File(p)
    try {
      assert(h5.readDoubles("/spikes/synthetic/timestamps").toSeq === ts.toSeq)
      assert(h5.readLongs("/spikes/synthetic/node_ids").toSeq === ids.toSeq)
      assert(h5.readDoubles("/spikes/synthetic/timestamps", 1, 4).toSeq === ts.slice(1, 4).toSeq)
    } finally h5.close()
  }

  test("v2 B-tree chunk index, DEPTH 1: internal root over several leaves") {
    val n = 52
    val ts2 = Array.tabulate(n)(_ * 0.75)
    val ids2 = Array.tabulate(n)(i => (i % 7).toLong)
    val dir = java.nio.file.Files.createTempDirectory("graft-h5bt1")
    val p = dir.resolve("bt1.h5").toString
    // node size 128 -> 7 records/leaf; 26 chunks -> depth-1 tree, 4 leaves
    Hdf5Writer.writeSonataSpikesBT(p, "synthetic", ts2, ids2,
      chunkRows = 2, nodeSize = 128)
    assert(countSig(p, "BTIN") === 2, "expected a depth-1 root per dataset")
    assert(countSig(p, "BTLF") >= 8)
    val h5 = new Hdf5File(p)
    try {
      assert(h5.readDoubles("/spikes/synthetic/timestamps").toSeq === ts2.toSeq)
      assert(h5.readLongs("/spikes/synthetic/node_ids").toSeq === ids2.toSeq)
      // range reads crossing leaf boundaries (chunks 6..8 span leaves)
      assert(h5.readDoubles("/spikes/synthetic/timestamps", 11, 37).toSeq ===
        ts2.slice(11, 37).toSeq)
    } finally h5.close()
    // and through the DSv2 source end-to-end
    val df = spark.read.format("sonata-spikes").load(p)
      .filter(col("time") >= 9.0 && col("time") < 12.0)
    assert(df.collect().map(_.getDouble(1)).sorted.toSeq ===
      ts2.filter(t => t >= 9.0 && t < 12.0).toSeq)
  }

  test("lookup3 checksum: empty input and length sensitivity") {
    assert(Hdf5Writer.lookup3(Array.empty[Byte]) === 0xdeadbeef)
    // 13 bytes exercises the >12 mix loop + tail; must differ from 12
    val d13 = Array.fill(13)(0x55.toByte)
    assert(Hdf5Writer.lookup3(d13) !== Hdf5Writer.lookup3(d13.take(12)))
  }

  test("convert-spikes campaign scaffold now carries a readable SONATA .h5") {
    val dir = java.nio.file.Files.createTempDirectory("graft-conv-h5").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "in.csv"),
      "timestamps node_ids\n3.5 2\n1.0 1\n2.25 0\n")
    graft.engine.Convert.convertCampaign(spark, s"$dir/in.csv", s"$dir/out").collect()
    val h5 = new Hdf5File(s"$dir/out/simulation/synthetic_spikes.h5")
    try {
      assert(h5.readDoubles("/spikes/synthetic/timestamps").toSeq === Seq(1.0, 2.25, 3.5))
      assert(h5.readLongs("/spikes/synthetic/node_ids").toSeq === Seq(1L, 0L, 2L))
      assert(h5.attr("/spikes/synthetic", "sorting").contains(2.0))
    } finally h5.close()
    // and the parquet table in the same scaffold holds identical rows
    val pq = spark.read.parquet(s"$dir/out/simulation/synthetic_spikes.parquet")
      .orderBy("time").collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(pq === Seq((1.0, 1L), (2.25, 0L), (3.5, 2L)))
  }
}
