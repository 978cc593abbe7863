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
    // (b) single scan in the plan
    val scans = "FileScan|BatchScan".r.findAllIn(
      bulk.queryExecution.executedPlan.toString).size
    assert(scans === 1, bulk.queryExecution.executedPlan.toString)
  }
}
