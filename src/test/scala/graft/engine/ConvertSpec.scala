package graft.engine

import graft.SparkSuite
import java.nio.file.{Files, Paths}

class ConvertSpec extends SparkSuite {

  test("csv spikes import: alias normalization, sort, stats, round-trip") {
    val dir = Files.createTempDirectory("graft-conv").toString
    Files.writeString(Paths.get(dir, "spikes.csv"),
      """timestamps node_ids
        |5.5 3
        |1.0 2
        |1.0 1
        |9.25 3
        |""".stripMargin)
    val out = s"$dir/spikes.parquet"
    val stats = Convert.convert(spark, s"$dir/spikes.csv", out).collect()(0)
    assert(stats.getLong(0) === 4)   // n_rows
    assert(stats.getLong(1) === 3)   // n_ids
    assert(stats.getLong(2) === 1 && stats.getLong(3) === 3)
    assert(stats.getDouble(4) === 1.0 && stats.getDouble(5) === 9.25)
    // normalized schema + converted file feeds the ParquetAdapter directly
    val sp = new ParquetAdapter().spikes(spark, out)
    assert(sp.columns.toSeq === Seq("time", "gid"))
    assert(sp.count() === 4)
  }

  test("missing alias errors clearly") {
    val dir = Files.createTempDirectory("graft-conv2").toString
    Files.writeString(Paths.get(dir, "bad.csv"), "a b\n1 2\n")
    val e = intercept[IllegalArgumentException] {
      Convert.readSpikesCsv(spark, s"$dir/bad.csv")
    }
    assert(e.getMessage.contains("no time column"))
  }
}
