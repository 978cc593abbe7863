package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** pandas-HDFStore fixed-format store (S11, reference store/hdf.py):
  * lossless round-trips plus raw-layout pins — the group/dataset/attr
  * structure is asserted directly through Hdf5File so the on-disk shape
  * matches the published pandas `FrameFixed` conventions, not merely
  * whatever this writer's reader expects.
  */
class PandasHdfSpec extends SparkSuite {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft-phdf").resolve(name).toString

  test("round-trip: long/double/string columns with NaN") {
    import spark.implicits._
    val in = Seq(
      (1L, 1.5, "alpha"),
      (2L, Double.NaN, "beta"),
      (3L, -0.25, ""))
      .toDF("id", "x", "name")
      .withColumn("x", when(isnan(col("x")), lit(null)).otherwise(col("x")))
    val p = tmp("simple.h5")
    PandasHdf.write(in, p, "repo")
    val out = PandasHdf.read(spark, p, Some("repo"))
    assert(out.schema.map(f => (f.name, f.dataType)) ===
      in.schema.map(f => (f.name, f.dataType)))
    assert(out.orderBy("id").collect().map(_.toString).toSeq ===
      in.orderBy("id").collect().map(_.toString).toSeq)
  }

  test("round-trip: MultiIndex via _index:<i>:<name> columns") {
    import spark.implicits._
    val in = Seq(
      (0L, "c0", "w1", 3.5),
      (0L, "c1", "w1", 4.5),
      (1L, "c0", "w2", 5.5))
      .toDF("_index:0:simulation_id", "_index:1:circuit", "window", "rate")
    val p = tmp("multi.h5")
    PandasHdf.write(in, p, "features")
    val out = PandasHdf.read(spark, p, Some("features"))
    assert(out.columns.toSeq ===
      Seq("_index:0:simulation_id", "_index:1:circuit", "window", "rate"))
    assert(out.orderBy("rate").collect().map(_.toString).toSeq ===
      in.orderBy("rate").collect().map(_.toString).toSeq)
  }

  test("round-trip: single named index, mixed block types") {
    import spark.implicits._
    val in = Seq((10L, 1L, 2.0, "x"), (20L, 2L, 4.0, "y"))
      .toDF("_index:0:gid", "count", "mean", "label")
    val p = tmp("single.h5")
    PandasHdf.write(in, p, "stats")
    val out = PandasHdf.read(spark, p, Some("stats"))
    assert(out.columns.toSeq === Seq("_index:0:gid", "count", "mean", "label"))
    assert(out.orderBy("_index:0:gid").collect().map(_.toString).toSeq ===
      in.orderBy("_index:0:gid").collect().map(_.toString).toSeq)
  }

  test("on-disk layout matches the pandas FrameFixed conventions") {
    import spark.implicits._
    val in = Seq(
      (0L, "c0", 1.5, 7L, "s0"),
      (1L, "c1", 2.5, 8L, "s1"))
      .toDF("_index:0:sim", "cls", "value", "n", "tag")
    val p = tmp("layout.h5")
    PandasHdf.write(in, p, "frame")
    val h5 = new Hdf5File(p)
    try {
      // PyTables node boilerplate + pandas frame markers
      assert(h5.attr("/", "PYTABLES_FORMAT_VERSION").contains("2.1"))
      assert(h5.attr("/frame", "pandas_type").contains("frame"))
      assert(h5.attr("/frame", "CLASS").contains("GROUP"))
      assert(h5.attr("/frame", "axis0_variety").contains("regular"))
      assert(h5.attr("/frame", "axis1_variety").contains("regular"))
      assert(h5.attr("/frame", "ndim").contains(2.0))
      // float + integer + string data columns → 3 blocks
      assert(h5.attr("/frame", "nblocks").contains(3.0))
      assert(h5.readStrings("/frame/axis0").toSeq ===
        Seq("cls", "value", "n", "tag"))
      assert(h5.attr("/frame/axis0", "kind").contains("string"))
      assert(h5.attr("/frame/axis0", "name").contains("columns"))
      assert(h5.attr("/frame/axis1", "kind").contains("integer"))
      assert(h5.attr("/frame/axis1", "name").contains("sim"))
      // blocks are stored transposed, shape (nItems, nRows)
      val blocks = (0 until 3).map { b =>
        val items = h5.readStrings(s"/frame/block${b}_items").toSeq
        assert(h5.dims(s"/frame/block${b}_values").toSeq ===
          Seq(items.length.toLong, 2L))
        assert(h5.attr(s"/frame/block${b}_values", "transposed").contains(1.0))
        assert(h5.attr(s"/frame/block${b}_values", "CLASS").contains("ARRAY"))
        assert(h5.attr(s"/frame/block${b}_values", "FLAVOR").contains("numpy"))
        items
      }
      assert(blocks.flatten.sorted === Seq("cls", "n", "tag", "value"))
      // values land in the right block rows
      val fb = blocks.indexWhere(_.contains("value"))
      assert(h5.readDoubles(s"/frame/block${fb}_values").toSeq === Seq(1.5, 2.5))
    } finally h5.close()
  }

  test("MultiIndex on-disk: levels, labels, names") {
    import spark.implicits._
    val in = Seq(
      (0L, "a", 1.0), (0L, "b", 2.0), (1L, "a", 3.0))
      .toDF("_index:0:sim", "_index:1:cls", "v")
    val p = tmp("mi.h5")
    PandasHdf.write(in, p, "f")
    val h5 = new Hdf5File(p)
    try {
      assert(h5.attr("/f", "axis1_variety").contains("multi"))
      assert(h5.attr("/f", "axis1_nlevels").contains(2.0))
      assert(h5.attr("/f", "axis1_name0").contains("sim"))
      assert(h5.attr("/f", "axis1_name1").contains("cls"))
      assert(h5.readLongs("/f/axis1_level0").toSeq === Seq(0L, 1L))
      assert(h5.readLongs("/f/axis1_label0").toSeq === Seq(0L, 0L, 1L))
      assert(h5.readStrings("/f/axis1_level1").toSeq === Seq("a", "b"))
      assert(h5.readLongs("/f/axis1_label1").toSeq === Seq(0L, 1L, 0L))
    } finally h5.close()
  }

  test("index-less frames get a RangeIndex-like axis1 and read back flat") {
    import spark.implicits._
    val in = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "s")
    val p = tmp("noidx.h5")
    PandasHdf.write(in, p, "t")
    val h5 = new Hdf5File(p)
    try assert(h5.readLongs("/t/axis1").toSeq === Seq(0L, 1L, 2L))
    finally h5.close()
    val out = PandasHdf.read(spark, p, Some("t"))
    assert(out.columns.toSeq === Seq("id", "s"))
    assert(out.count() === 3)
  }

  test("CacheManager on store_type=hdf: cache hit, invalidation, corruption") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hdf-cache").toString
    var computes = 0
    def frame = {
      computes += 1
      Seq((0L, "exc", 1.5), (1L, "inh", 2.5))
        .toDF("_index:0:simulation_id", "neuron_class", "rate")
    }
    val cm = new graft.engine.CacheManager(spark, dir, storeType = "hdf")
    try {
      val a = cm.loadOrCompute("repo", "neurons", "chain-1", frame)
      assert(a.count() === 2 && computes === 1)
      assert(java.nio.file.Files.isRegularFile(
        java.nio.file.Paths.get(s"$dir/repo/neurons.h5")))
      val b = cm.loadOrCompute("repo", "neurons", "chain-1", frame)
      assert(b.columns.toSeq ===
        Seq("_index:0:simulation_id", "neuron_class", "rate"))
      assert(b.collect().map(_.toSeq).toSet === a.collect().map(_.toSeq).toSet)
      assert(computes === 1)
      cm.loadOrCompute("repo", "neurons", "chain-2", frame)
      assert(computes === 2)
      // C4: on-disk corruption forces a rebuild
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/repo/neurons.h5"), "garbage".getBytes)
      cm.loadOrCompute("repo", "neurons", "chain-2", frame)
      assert(computes === 3)
    } finally cm.close()
  }

  test("over-limit frames refuse BEFORE the driver materializes them") {
    import spark.implicits._
    // a column that throws if (and only if) its rows are ever evaluated:
    // the pre-flight agg reads only count + string widths, so a clean
    // IllegalArgumentException (not the raise_error SparkException)
    // proves the size guard fired before df.collect()
    val boobyTrapped = spark.range(1000).select(
      col("id"),
      raise_error(lit("frame was materialized")).cast("double").as("v"),
      lit("some-string-payload").as("s"))
    val e = intercept[IllegalArgumentException] {
      PandasHdf.write(boobyTrapped, tmp("big.h5"), "k", maxBytes = 1024L)
    }
    assert(e.getMessage.contains("exceeds"))
    assert(e.getMessage.contains("parquet store"))
    // same frame without the trap fits a raised limit and round-trips
    val ok = spark.range(10).select(col("id"), lit(1.5).as("v"))
    val p = tmp("small.h5")
    PandasHdf.write(ok, p, "k", maxBytes = 1 << 20)
    assert(PandasHdf.read(spark, p, Some("k")).count() === 10L)
  }

  test("table-format frames refuse with an actionable message") {
    import spark.implicits._
    val p = tmp("table.h5")
    PandasHdf.write(Seq((1L, 2.0)).toDF("a", "b"), p, "k")
    // byte-patch the pandas_type attr value "frame" → "table" (same
    // length, so every offset in the file stays valid): the reader must
    // refuse it as table-format, the way it would a real pytables
    // frame_table, not crash on the unexpected layout
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    val needle = "frame".getBytes("US-ASCII")
    val hits = bytes.indices.filter(i =>
      i + needle.length <= bytes.length &&
        needle.indices.forall(j => bytes(i + j) == needle(j)))
    assert(hits.size === 1, "expected exactly one 'frame' occurrence to patch")
    "table".getBytes("US-ASCII").zipWithIndex.foreach { case (b, j) =>
      bytes(hits.head + j) = b
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(p), bytes)
    val e = intercept[IllegalArgumentException](PandasHdf.read(spark, p, Some("k")))
    assert(e.getMessage.contains("table-format"))
    assert(e.getMessage.contains("format='fixed'"))
  }

  test("boolean and int coerce up; unsupported types refuse clearly") {
    import spark.implicits._
    val in = Seq((1, true), (2, false)).toDF("i", "b")
    val p = tmp("coerce.h5")
    PandasHdf.write(in, p, "c")
    val out = PandasHdf.read(spark, p, Some("c")).orderBy("i").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 1L), (2L, 0L)))
    val bad = Seq((1, Seq(1.0))).toDF("i", "arr")
    val e = intercept[IllegalArgumentException](PandasHdf.write(bad, p, "c"))
    assert(e.getMessage.contains("unsupported column type"))
  }
}
