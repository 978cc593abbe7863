package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._
import scala.sys.process._

/** Two-way feather interop against GENUINE pyarrow/pandas — the actual
  * library behind the reference's feather store (store/feather.py is
  * `DataFrame.to_feather`/`read_feather`). The checked-in
  * blueetl_features.feather fixture pins the read side against stored
  * bytes; this spec additionally runs live in both directions whenever
  * python3+pyarrow exist on the machine (they do on the dev/CI image;
  * the spec cancels, not fails, elsewhere).
  */
class FeatherPyarrowInteropSpec extends SparkSuite {

  private lazy val pyarrowAvailable: Boolean =
    try Process(Seq("python3", "-c", "import pyarrow.feather, pandas")).! == 0
    catch { case _: Exception => false }

  private def py(script: String): String = {
    val f = java.nio.file.Files.createTempFile("graft-py", ".py")
    java.nio.file.Files.writeString(f, script)
    Seq("python3", f.toString).!!
  }

  test("pyarrow reads a FeatherIO-written file with exact values and nulls") {
    assume(pyarrowAvailable, "python3 + pyarrow not on this machine")
    import spark.implicits._
    val in = Seq(
      (1L, "alpha", 1.5, Some(10), true),
      (2L, "beta", 2.5, None, false),
      (3L, null.asInstanceOf[String], -0.25, Some(30), true))
      .toDF("id", "name", "x", "opt", "flag")
      .withColumn("opt", col("opt").cast("int"))
    val p = java.nio.file.Files.createTempDirectory("graft-py-interop")
      .resolve("ours.feather").toString
    FeatherIO.write(in, p)
    val out = py(
      s"""import pyarrow.feather as f
         |t = f.read_table('$p')
         |for row in t.to_pylist():
         |    print('|'.join(str(row[c]) for c in ['id','name','x','opt','flag']))
         |""".stripMargin).trim.linesIterator.toSeq.sorted
    assert(out === Seq(
      "1|alpha|1.5|10|True",
      "2|beta|2.5|None|False",
      "3|None|-0.25|30|True").sorted)
  }

  test("FeatherIO reads a fresh pandas.to_feather frame: MultiIndex, categorical, NaN") {
    assume(pyarrowAvailable, "python3 + pyarrow not on this machine")
    val p = java.nio.file.Files.createTempDirectory("graft-py-interop2")
      .resolve("theirs.feather").toString
    py(
      s"""import pandas as pd, numpy as np
         |df = pd.DataFrame({
         |    'simulation_id': pd.array([0, 0, 1, 1], dtype='int64'),
         |    'neuron_class': ['exc', 'inh', 'exc', 'inh'],
         |    'window': pd.Categorical(['w1', 'w2', 'w1', 'w2']),
         |    'mean_rate': [1.5, np.nan, 3.25, 4.0],
         |    'count': pd.array([10, 20, 30, 40], dtype='int32'),
         |    'ok': [True, False, True, True],
         |}).set_index(['simulation_id', 'neuron_class'])
         |df.to_feather('$p')
         |""".stripMargin)
    val df = FeatherIO.read(spark, p)
    // plain to_feather appends the serialized index columns at the END of
    // the file (the reference's own store instead writes explicit
    // `_index:<i>:<name>` columns up front — that layout is pinned by the
    // checked-in blueetl_features.feather fixture); order aside, every
    // level must surface under its bare name
    assert(df.columns.toSet ===
      Set("simulation_id", "neuron_class", "window", "mean_rate", "count", "ok"))
    val rows = df.orderBy("simulation_id", "neuron_class").collect()
    assert(rows.length === 4)
    assert(rows.map(_.getAs[String]("window")).toSeq === Seq("w1", "w2", "w1", "w2"))
    assert(rows(1).isNullAt(rows(1).fieldIndex("mean_rate")))
    assert(rows(2).getAs[Double]("mean_rate") === 3.25)
    assert(rows.map(_.getAs[Int]("count")).toSeq === Seq(10, 20, 30, 40))
    assert(rows.map(_.getAs[Boolean]("ok")).toSeq === Seq(true, false, true, true))
  }

  test("pandas round-trips a FeatherIO cache frame unchanged (write→pandas→read)") {
    assume(pyarrowAvailable, "python3 + pyarrow not on this machine")
    import spark.implicits._
    val in = Seq((0L, "exc", 7.5), (1L, "inh", 8.25))
      .toDF("simulation_id", "neuron_class", "mean_rate")
    val dir = java.nio.file.Files.createTempDirectory("graft-py-interop3")
    val ours = dir.resolve("ours.feather").toString
    val theirs = dir.resolve("back.feather").toString
    FeatherIO.write(in, ours)
    py(
      s"""import pandas as pd
         |pd.read_feather('$ours').to_feather('$theirs')
         |""".stripMargin)
    val back = FeatherIO.read(spark, theirs).orderBy("simulation_id")
    assert(back.collect().map(_.toSeq).toSeq ===
      in.orderBy("simulation_id").collect().map(_.toSeq).toSeq)
  }
}
