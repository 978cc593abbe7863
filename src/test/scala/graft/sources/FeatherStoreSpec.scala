package graft.sources

import graft.SparkSuite
import graft.engine.CacheManager
import org.apache.spark.sql.functions._

/** S10 feather store: FeatherIO against a GENUINE pandas/pyarrow-written
  * file (the reference's own writer — store/feather.py is
  * `DataFrame.to_feather`), a Spark-side round trip, and the CacheManager
  * running end-to-end on store_type=feather with C4 corruption detection.
  */
class FeatherStoreSpec extends SparkSuite {

  private val fixture = getClass.getResource("/blueetl_features.feather").getPath

  test("reads a pandas-written blueetl cache frame: indexes, categoricals, nulls") {
    val df = FeatherIO.read(spark, fixture)
    // _index:<i>:<name> columns surface under their bare names
    // (store/feather.py:38-48 _columns_to_index relational equivalent)
    assert(df.columns.toSeq ===
      Seq("simulation_id", "neuron_class", "window", "mean_rate", "count", "ok"))
    assert(df.count() === 4)
    val rows = df.orderBy("simulation_id", "neuron_class").collect()
    // categorical decoded to plain strings
    assert(rows.map(_.getAs[String]("window")).toSeq === Seq("w1", "w2", "w1", "w2"))
    assert(rows(0).getAs[Long]("simulation_id") === 0L)
    assert(rows(0).getAs[String]("neuron_class") === "exc")
    assert(rows(0).getAs[Double]("mean_rate") === 1.5)
    assert(rows(1).isNullAt(rows(1).fieldIndex("mean_rate"))) // pandas NaN → null
    assert(rows(2).getAs[Int]("count") === 30)
    assert(rows.map(_.getAs[Boolean]("ok")).toSeq === Seq(true, false, true, true))
  }

  test("spark-side round trip preserves values, types, and nulls") {
    import spark.implicits._
    val in = Seq(
      (1L, "a", 1.5, Some(10), true),
      (2L, "b", 2.5, None, false),
      (3L, null.asInstanceOf[String], 3.5, Some(30), true))
      .toDF("id", "name", "x", "opt", "flag")
      .withColumn("opt", col("opt").cast("int"))
    val p = java.nio.file.Files.createTempDirectory("graft-feather")
      .resolve("t.feather").toString
    FeatherIO.write(in, p)
    val back = FeatherIO.read(spark, p).orderBy("id")
    assert(back.schema.map(f => (f.name, f.dataType.simpleString)) ===
      in.schema.map(f => (f.name, f.dataType.simpleString)))
    assert(back.collect().map(_.toSeq).toSeq === in.orderBy("id").collect().map(_.toSeq).toSeq)
  }

  test("write streams record batches: a data-scale frame cannot OOM the driver") {
    import spark.implicits._
    val n = 1000
    val in = (0 until n).map(i => (i.toLong, s"doc-$i", i * 0.5)).toDF("id", "name", "x")
    val p = java.nio.file.Files.createTempDirectory("graft-feather-stream")
      .resolve("big.feather").toString
    // small batch size: forces the toLocalIterator multi-batch path
    FeatherIO.write(in.repartition(7), p, batchRows = 64)
    // the file genuinely holds multiple Arrow record batches
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val ch = java.nio.channels.FileChannel.open(java.nio.file.Paths.get(p))
    val reader = new org.apache.arrow.vector.ipc.ArrowFileReader(ch, alloc)
    val nBatches =
      try { var k = 0; while (reader.loadNextBatch()) k += 1; k }
      finally { reader.close(); ch.close(); alloc.close() }
    assert(nBatches >= n / 64, s"expected multiple record batches, got $nBatches")
    val back = FeatherIO.read(spark, p)
    assert(back.count() === n)
    assert(back.select("id").as[Long].collect().sorted.toSeq === (0 until n).map(_.toLong))
    assert(back.agg(sum("x")).head.getDouble(0) === (0 until n).map(_ * 0.5).sum)
  }

  test("CacheManager on store_type=feather: cache hit, invalidation, corruption") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-feather-cache").toString
    var computes = 0
    def frame = { computes += 1; Seq((1L, "x"), (2L, "y")).toDF("gid", "cls") }
    val cm = new CacheManager(spark, dir, storeType = "feather")
    try {
      val a = cm.loadOrCompute("repo", "neurons", "chain-1", frame)
      assert(a.count() === 2 && computes === 1)
      assert(java.nio.file.Files.isRegularFile(
        java.nio.file.Paths.get(s"$dir/repo/neurons.feather")))
      // warm hit: no recompute
      val b = cm.loadOrCompute("repo", "neurons", "chain-1", frame)
      assert(b.collect().map(_.toSeq).toSet === a.collect().map(_.toSeq).toSet)
      assert(computes === 1)
      // chain change invalidates
      cm.loadOrCompute("repo", "neurons", "chain-2", frame)
      assert(computes === 2)
      // C4: on-disk corruption forces a rebuild
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/repo/neurons.feather"), "garbage".getBytes)
      cm.loadOrCompute("repo", "neurons", "chain-2", frame)
      assert(computes === 3)
    } finally cm.close()
  }
}
