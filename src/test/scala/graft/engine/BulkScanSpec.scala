package graft.engine

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The bulk multi-path scan must (a) agree with the per-simulation union,
  * (b) keep the plan a single parquet scan, (c) not confuse sims whose
  * directory names share a prefix (sim1 vs sim10).
  */
class BulkScanSpec extends SparkSuite {

  test("bulk scan equals union and maps prefix-sharing sims correctly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bulk").toString
    // sims named sim1 and sim10 — the prefix trap
    for ((name, base) <- Seq(("sim1", 0), ("sim10", 100))) {
      (1 to 20).map(k => (base + k * 1.0, k.toLong))
        .toDF("time", "gid").write.mode("overwrite").parquet(s"$dir/$name")
    }
    val sims = Seq((0, 0, s"$dir/sim1"), (1, 0, s"$dir/sim10"))
    val adapter = new ParquetAdapter
    val bulk = adapter.spikesBulk(spark, sims).get
    // (a) equality with the union path
    val union = sims.map { case (sid, cid, p) =>
      adapter.spikes(spark, p)
        .select(lit(sid).as("simulation_id"), lit(cid).as("circuit_id"),
          col("time"), col("gid"))
    }.reduce(_ unionByName _)
    assert(bulk.count() === union.count())
    assert(bulk.except(union).count() === 0 && union.except(bulk).count() === 0)
    // (c) rows landed with the right simulation ids
    val bySim = bulk.groupBy("simulation_id").agg(min("time"), max("time")).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(bySim(0) === ((1.0, 20.0)))
    assert(bySim(1) === ((101.0, 120.0)))
    // (b) single scan in the plan, and the file→sim mapping is an
    // equi-join (a startsWith theta-join would plan a nested loop doing
    // O(#sims) prefix tests per event)
    val plan = bulk.queryExecution.executedPlan.toString
    val scans = "FileScan|BatchScan".r.findAllIn(plan).size
    assert(scans === 1, plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("mixed campaign: flat-dir sim and plain-file sim both map") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bulk-mixed").toString
    // sim A: flat parquet directory
    (1 to 20).map(k => (k * 1.0, k.toLong)).toDF("time", "gid")
      .write.mode("overwrite").parquet(s"$dir/simA")
    // sim B: one plain parquet FILE (not a directory)
    (1 to 10).map(k => (1000.0 + k, k.toLong)).toDF("time", "gid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/simB_dir")
    val bFile = new java.io.File(s"$dir/simB_dir").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    val sims = Seq((0, 0, s"$dir/simA"), (1, 0, bFile))
    val bulk = new ParquetAdapter().spikesBulk(spark, sims).get
    val bySim = bulk.groupBy("simulation_id")
      .agg(count(lit(1)).as("n"), min("time"), max("time")).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(bySim(0) === ((20L, 1.0, 20.0)))
    assert(bySim(1) === ((10L, 1001.0, 1010.0)))
    assert(!bulk.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
  }

  test("64-simulation campaign: still ONE scan, every sim maps correctly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bulk-many").toString
    val nSims = 64
    // one shared frame written per sim dir (driver loop, tiny files)
    for (i <- 0 until nSims)
      Seq((i * 1000.0, i.toLong)).toDF("time", "gid")
        .coalesce(1).write.mode("overwrite").parquet(f"$dir/sim$i%03d")
    val sims = (0 until nSims).map(i => (i, 0, f"$dir/sim$i%03d"))
    val bulk = new ParquetAdapter().spikesBulk(spark, sims).get
    val got = bulk.select("simulation_id", "time").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got.size === nSims)
    assert((0 until nSims).forall(i => got(i) === i * 1000.0))
    val plan = bulk.queryExecution.executedPlan.toString
    assert("FileScan|BatchScan".r.findAllIn(plan).size === 1, plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("hive-partitioned sim falls back to the union path (bulk = None)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bulk-part").toString
    (1 to 20).map(k => (k * 1.0, k.toLong, k % 2)).toDF("time", "gid", "part")
      .write.partitionBy("part").mode("overwrite").parquet(s"$dir/simA")
    // Spark's multi-path read rejects mixed directory structures, so the
    // adapter must decline the bulk scan rather than fail at read time
    assert(new ParquetAdapter().spikesBulk(spark, Seq((0, 0, s"$dir/simA"))).isEmpty)
  }

  test("report neurons join is not force-broadcast (AQE decides)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bulk-hint").toString
    Seq((10.0, 0L), (20.0, 1L), (30.0, 0L)).toDF("time", "gid")
      .write.mode("overwrite").parquet(s"$dir/sim0")
    Seq(0L, 1L).toDF("gid").write.mode("overwrite").parquet(s"$dir/nodes")
    val campaign = Campaign("hint", dir, Map.empty, Seq(
      Map("simulation_path" -> "sim0", "circuit_path" -> s"$dir/nodes")))
    val cfg = SingleAnalysisConfig(
      name = "h", reportType = "spikes",
      windows = Map("w" -> WindowSpec(bounds = (0.0, 100.0))),
      neuronClasses = Map("all" -> NeuronClassSpec()),
      features = Nil)
    val repo = new Repository(spark, campaign, cfg, new ParquetAdapter)
    // with auto-broadcast disabled, an unhinted neurons join must plan as
    // a shuffle join (the old forced broadcast would ignore the threshold);
    // the windows range join keeps its hint and stays broadcast
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val plan = repo.report.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"neurons join still force-broadcast:\n$plan")
    } finally spark.conf.set(key, saved)
  }
}
