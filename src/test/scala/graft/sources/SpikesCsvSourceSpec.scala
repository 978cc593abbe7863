package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class SpikesCsvSourceSpec extends SparkSuite {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-dsv2").toString
    Files.writeString(Paths.get(d, "a.csv"),
      """timestamps node_ids
        |1.0 1
        |2.5 2
        |3.0 1
        |9.0 3
        |""".stripMargin)
    Files.writeString(Paths.get(d, "b.csv"),
      """timestamps node_ids
        |4.0 2
        |5.5 1
        |""".stripMargin)
    d
  }

  private def src = spark.read.format(classOf[SpikesCsvSource].getName).load(dir)

  test("reads a directory of spike files with the canonical schema") {
    assert(src.schema.fieldNames.toSeq === Seq("time", "gid"))
    assert(src.count() === 6)
    assert(src.agg(sum("gid")).collect()(0).getLong(0) === 10)
  }

  test("filters push into the scan and results are correct") {
    val q = src.filter(col("gid") === 1 && col("time") < 5.0)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("EqualTo(gid,1)") && scan.contains("LessThan(time,5.0)"), scan)
    // filters are fully absorbed: no residual Filter node above the scan
    assert(!scan.contains("+- Filter"), scan)
    val times = q.select("time").collect().map(_.getDouble(0)).sorted
    assert(times.toSeq === Seq(1.0, 3.0))
  }

  test("column pruning reaches the reader") {
    val q = src.filter(col("time") >= 4.0).select("gid")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("cols=[gid]") || scan.contains("ReadSchema: struct<gid:bigint>"), scan)
    assert(q.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("one partition per file (parallel scan)") {
    assert(src.rdd.getNumPartitions === 2)
  }

  test("malformed and comment lines are skipped, not fatal") {
    val d = Files.createTempDirectory("graft-dsv2-bad").toString
    Files.writeString(Paths.get(d, "bad.csv"),
      """times ids
        |1.0 1
        |# a comment line
        |not a number
        |2.0 oops
        |3.0 2
        |""".stripMargin)
    val df = spark.read.format("spikes-csv").load(d)
    assert(df.count() === 2)
    assert(df.agg(sum("gid")).collect()(0).getLong(0) === 3)
  }

  test("gid predicates evaluate in Long beyond 2^53") {
    val big = (1L << 53) + 1 // not representable as Double
    val d = Files.createTempDirectory("graft-dsv2-big").toString
    Files.writeString(Paths.get(d, "big.csv"),
      s"""times ids
         |1.0 ${big}
         |2.0 ${big - 1}
         |""".stripMargin)
    val df = spark.read.format("spikes-csv").load(d)
    val got = df.filter(col("gid") === big).collect()
    assert(got.length === 1 && got(0).getLong(1) === big)
  }

  test("null-bearing In filters stay residual (no NPE), results correct") {
    import org.apache.spark.sql.sources.{EqualTo, In}
    assert(!SpikesCsvSource.supported(In("gid", Array[Any](1L, null))))
    assert(!SpikesCsvSource.supported(EqualTo("gid", null)))
    assert(SpikesCsvSource.supported(In("gid", Array[Any](1L, 2L))))
    val q = src.filter(col("gid").isin(1L, 2L) || col("gid").isNull)
    assert(q.count() === 5)
  }

  test("short name resolves and the adapter extracts through the engine") {
    import graft.engine._
    import graft.dsl.QTrue
    val byName = spark.read.format("spikes-csv").load(dir)
    assert(byName.count() === 6)
    import spark.implicits._
    val nodesDir = Files.createTempDirectory("graft-dsv2-nodes").toString
    Seq(1L, 2L, 3L).toDF("gid").write.mode("overwrite").parquet(nodesDir)
    val campaign = Campaign("csv", "", Map.empty, Seq(
      Map("simulation_path" -> dir, "circuit_path" -> nodesDir)))
    val cfg = SingleAnalysisConfig(
      name = "s", reportType = "spikes",
      windows = Map("w" -> WindowSpec(bounds = (0.0, 100.0))),
      neuronClasses = Map("all" -> NeuronClassSpec()),
      features = Nil)
    val repo = new Repository(spark, campaign, cfg, new CsvSpikesAdapter, QTrue)
    assert(repo.report.count() === 6)
  }
}
