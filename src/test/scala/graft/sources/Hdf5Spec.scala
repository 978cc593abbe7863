package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Core HDF5 reader validated against REAL h5py-written files: the
  * reference repo's own SONATA fixtures (tests/unit/data, doc/source/data
  * of BlueBrain/blueetl). Ground truth is triple-sourced:
  *  - byte-level: the decoded values below were located as raw
  *    little-endian sequences in the files (f64 run at offset 3280,
  *    i64 run at 3320 of spikes.h5) independent of this reader;
  *  - cross-population: default (by_time) and default2 (by_id) hold the
  *    SAME spikes in different orders — their sorted zips must agree;
  *  - config-level: counts/ranges agree with the fixtures' own
  *    simulation_config.json (tstop, dt) and mapping arithmetic.
  */
class Hdf5Spec extends AnyFunSuite {

  private val unitData = "/root/reference/tests/unit/data"
  private val spikesH5 = s"$unitData/simulation/sonata/reporting/spikes.h5"
  private val somaH5 = s"$unitData/simulation/sonata/reporting/soma_report.h5"
  private val compH5 = s"$unitData/simulation/sonata/reporting/compartment_named.h5"
  private val nodesH5 = s"$unitData/circuit/sonata/nodes.h5"
  private val docSpikes = "/root/reference/doc/source/data/simulation-campaign/0/reporting/spikes.h5"

  private def withFile[A](p: String)(f: Hdf5File => A): A = {
    val h = new Hdf5File(p)
    try f(h) finally h.close()
  }

  test("spikes.h5: groups, sorting attrs, exact dataset values") {
    withFile(spikesH5) { h5 =>
      assert(h5.ls("/spikes") === Seq("default", "default2"))
      // SONATA sorting enum: by_time=2, by_id=1 (convert_spikes.py:136)
      assert(h5.attr("/spikes/default", "sorting").contains(2.0))
      assert(h5.attr("/spikes/default2", "sorting").contains(1.0))
      assert(h5.readDoubles("/spikes/default/timestamps").toSeq ===
        Seq(0.1, 0.2, 0.3, 0.7, 1.3))
      assert(h5.readLongs("/spikes/default/node_ids").toSeq === Seq(2L, 0L, 1L, 2L, 0L))
      // by_id population: same multiset, id-major order
      assert(h5.readLongs("/spikes/default2/node_ids").toSeq === Seq(0L, 0L, 1L, 2L, 2L))
      val a = h5.readDoubles("/spikes/default/timestamps")
        .zip(h5.readLongs("/spikes/default/node_ids")).sorted.toSeq
      val b = h5.readDoubles("/spikes/default2/timestamps")
        .zip(h5.readLongs("/spikes/default2/node_ids")).sorted.toSeq
      assert(a === b, "by_time and by_id populations must hold the same spikes")
    }
  }

  test("element-range reads equal slices of the full read") {
    withFile(spikesH5) { h5 =>
      val full = h5.readDoubles("/spikes/default/timestamps")
      assert(h5.readDoubles("/spikes/default/timestamps", 1, 4).toSeq ===
        full.slice(1, 4).toSeq)
      assert(h5.readDoubles("/spikes/default/timestamps", 4, 5).toSeq ===
        full.slice(4, 5).toSeq)
      assert(h5.readLongs("/spikes/default/node_ids", 2, 3).toSeq === Seq(1L))
    }
  }

  test("soma report: 2-D f32 data, mapping arithmetic, row slabs") {
    withFile(somaH5) { h5 =>
      assert(h5.dims("/report/default/data") === Seq(10L, 3L))
      val time = h5.readDoubles("/report/default/mapping/time").toSeq
      assert(time === Seq(0.0, 1.0, 0.1)) // start, stop, step → 10 frames
      assert(((time(1) - time(0)) / time(2)).round === 10L)
      assert(h5.readLongs("/report/default/mapping/node_ids").toSeq === Seq(0L, 1L, 2L))
      // data[t][i] = i + t/10 in f32 (the bluepysnap test fixture pattern)
      val row0 = h5.readDoubles("/report/default/data", 0, 3)
      assert(row0.toSeq === Seq(0.0, 1.0, 2.0))
      val row1 = h5.readDoubles("/report/default/data", 3, 6)
      assert(row1.zip(Seq(0.1, 1.1, 2.1)).forall { case (a, e) => math.abs(a - e) < 1e-6 })
      // a mid-matrix slab equals the full read's slice
      val full = h5.readDoubles("/report/default/data")
      assert(h5.readDoubles("/report/default/data", 12, 21).toSeq ===
        full.slice(12, 21).toSeq)
    }
  }

  test("compartment report: index_pointers partition the columns") {
    withFile(compH5) { h5 =>
      assert(h5.dims("/report/default/data") === Seq(10L, 7L))
      val idx = h5.readLongs("/report/default/mapping/index_pointers").toSeq
      assert(idx === Seq(0L, 2L, 4L, 7L))
      // confirmed against the raw bytes: i32 run [0,1,0,1,0,1,1] at 3472
      assert(h5.readLongs("/report/default/mapping/element_ids").toSeq ===
        Seq(0L, 1L, 0L, 1L, 0L, 1L, 1L))
    }
  }

  test("nodes.h5: vlen strings via global heap, numerics, nested groups") {
    withFile(nodesH5) { h5 =>
      assert(h5.ls("/nodes") === Seq("default", "default2"))
      assert(h5.readStrings("/nodes/default/0/mtype").toSeq === Seq("L2_X", "L6_Y", "L6_Y"))
      assert(h5.readStrings("/nodes/default/0/model_type").toSeq ===
        Seq("biophysical", "biophysical", "biophysical"))
      assert(h5.readStrings("/nodes/default/0/model_template").toSeq ===
        Seq("hoc:small_bio-A", "hoc:small_bio-B", "hoc:small_bio-C"))
      assert(h5.readDoubles("/nodes/default/0/layer").toSeq === Seq(2.0, 6.0, 6.0))
      assert(h5.readDoubles("/nodes/default/0/x").toSeq === Seq(101.0, 201.0, 301.0))
      assert(h5.readDoubles("/nodes/default/0/dynamics_params/holding_current").toSeq ===
        Seq(0.1, 0.2, 0.3))
      // string reads reject numeric datasets and vice versa
      intercept[IllegalArgumentException](h5.readDoubles("/nodes/default/0/mtype"))
      intercept[IllegalArgumentException](h5.readStrings("/nodes/default/0/x"))
    }
  }

  test("real simulation output (doc campaign): sorted, in-range, exact head") {
    withFile(docSpikes) { h5 =>
      assert(h5.ls("/spikes") === Seq("thalamus_neurons"))
      assert(h5.attr("/spikes/thalamus_neurons", "sorting").contains(2.0))
      val ts = h5.readDoubles("/spikes/thalamus_neurons/timestamps")
      assert(ts.length === 10)
      assert(ts.toSeq === ts.sorted.toSeq) // by_time holds
      assert(ts.forall(t => t >= 0 && t <= 100)) // tstop=100 in its config
      assert(math.abs(ts(0) - 22.3000000001) < 1e-9)
      assert(h5.readLongs("/spikes/thalamus_neurons/node_ids")(0) === 300L)
    }
  }

  test("big-endian numeric datasets decode correctly (numpy '>f8'/'>i8')") {
    // build a known-good LE file, then flip both datatype byte-order flags
    // and byte-swap the trailing data region — exactly the bytes h5py
    // writes for a big-endian numpy array (same values, BE encoding)
    val ts = Array(0.5, 1.25, 2.0, 3.5, 7.75)
    val ids = Array(3L, 1L, 4L, 1L, 0L)
    val p = java.nio.file.Files.createTempFile("graft-be", ".h5")
    Hdf5Writer.writeSonataSpikes(p.toString, "be", ts, ids)
    val bytes = java.nio.file.Files.readAllBytes(p)
    // f64 datatype message body (v1, class 1, flags 0x20, size 8)
    val f = bytes.indexOfSlice(Array[Byte](0x11, 0x20, 0x3f, 0, 8, 0, 0, 0))
    assert(f > 0, "float64 datatype message not found")
    bytes(f + 1) = 0x21.toByte // order bit -> big-endian
    // u64 datatype message body (v1, class 0, flags 0, size 8, prec 64)
    val i = bytes.indexOfSlice(Array[Byte](0x10, 0, 0, 0, 8, 0, 0, 0, 0, 0, 0x40, 0))
    assert(i > 0, "int64 datatype message not found")
    bytes(i + 1) = 0x01.toByte
    // data = last 16n bytes (timestamps then node_ids): reverse each element
    val dataStart = bytes.length - 16 * ts.length
    for (e <- 0 until 2 * ts.length; k <- 0 until 4) {
      val a = dataStart + 8 * e + k; val b = dataStart + 8 * e + 7 - k
      val t = bytes(a); bytes(a) = bytes(b); bytes(b) = t
    }
    java.nio.file.Files.write(p, bytes)
    withFile(p.toString) { h5 =>
      assert(h5.readDoubles("/spikes/be/timestamps").toSeq === ts.toSeq)
      assert(h5.readLongs("/spikes/be/node_ids").toSeq === ids.toSeq)
      // and readLongs on the BE float dataset still coerces correctly
      assert(h5.readLongs("/spikes/be/timestamps").toSeq === ts.map(_.toLong).toSeq)
    }
  }

  test("missing paths and non-HDF5 files error clearly") {
    withFile(spikesH5) { h5 =>
      assert(!h5.exists("/spikes/nope"))
      intercept[NoSuchElementException](h5.readDoubles("/spikes/nope/timestamps"))
    }
    val tmp = java.nio.file.Files.createTempFile("nothdf", ".h5")
    java.nio.file.Files.write(tmp, "parquet, actually".getBytes)
    intercept[IllegalArgumentException](new Hdf5File(tmp.toString))
  }
}
