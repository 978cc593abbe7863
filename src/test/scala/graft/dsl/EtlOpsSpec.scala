package graft.dsl

import graft.SparkSuite
import graft.engine.{FeaturesSpec, FeatureExpansion}
import org.apache.spark.sql.functions._

class EtlOpsSpec extends SparkSuite {

  import EtlOps._
  import spark.implicits._

  private lazy val df = Seq(
    (1L, 10.0, "A"), (2L, 20.0, "A"), (3L, 30.0, "B")
  ).toDF("id", "v", "cls")

  test("q with parsed dict form") {
    assert(df.etl.q(Map("cls" -> "A")).count() === 2)
    assert(df.etl.q(Map("v" -> Map("ge" -> 20.0))).count() === 2)
    assert(df.etl.q(Map("id" -> Seq(1, 3))).count() === 2)
  }

  test("one asserts single row; firstRow with explicit order") {
    assert(df.etl.one(QAnd("id" -> QCond(QEq(2)))).collect()(0).getDouble(1) === 20.0)
    assertThrows[IllegalArgumentException] { df.etl.one(QAnd("cls" -> QCond(QEq("A")))) }
    assert(df.etl.firstRow(QTrue, orderBy = Seq("v")).getLong(0) === 1L)
  }

  test("addConditions prepends key columns; remove/keep/labels/groups") {
    val withKeys = df.etl.addConditions(Seq("sim" -> 7, "win" -> "w1"))
    assert(withKeys.columns.toSeq === Seq("sim", "win", "id", "v", "cls"))
    assert(withKeys.select("sim").distinct().collect()(0).getInt(0) === 7)
    assert(withKeys.etl.removeConditions(Seq("sim")).columns.toSeq ===
      Seq("win", "id", "v", "cls"))
    assert(df.etl.labels("cls") === Seq("A", "B"))
    assert(df.etl.groups(Seq("cls")).count() === 2)
  }

  test("params_product expansion generates suffixed combos") {
    val base = FeaturesSpec(groupby = Seq("g"), function = "f", params = Map("fixed" -> 1))
    val combos = FeatureExpansion.expand(
      base, product = Map("a" -> Seq(1, 2), "b" -> Seq("x", "y")), zip = Map.empty)
    assert(combos.size === 4)
    // reference suffix scheme: one _i per product key in key order
    // (config/analysis.py:133-139; goldens analysis_09)
    assert(combos.map(_.suffix) === Seq("_0_0", "_0_1", "_1_0", "_1_1"))
    assert(combos.forall(_.params("fixed") == 1))
    assert(combos.map(c => (c.params("a"), c.params("b"))) ===
      Seq((1, "x"), (1, "y"), (2, "x"), (2, "y")))
    // product × zip composes like the reference: _i_j then __k
    val both = FeatureExpansion.expand(
      base, product = Map("a" -> Seq(1, 2)),
      zip = Map("p" -> Seq(10, 20), "q" -> Seq(11, 21)))
    assert(both.map(_.suffix) === Seq("_0__0", "_0__1", "_1__0", "_1__1"))
    assert(both.map(c => (c.params("a"), c.params("p"), c.params("q"))) ===
      Seq((1, 10, 11), (1, 20, 21), (2, 10, 11), (2, 20, 21)))
    // unequal zip lengths are rejected (reference raises too)
    intercept[IllegalArgumentException](FeatureExpansion.expand(
      base, product = Map.empty, zip = Map("a" -> Seq(1), "b" -> Seq(1, 2))))
  }

  test("params_zip pairs positionally") {
    val base = FeaturesSpec(groupby = Seq("g"), function = "f")
    val combos = FeatureExpansion.expand(
      base, product = Map.empty, zip = Map("a" -> Seq(1, 2), "b" -> Seq("x", "y")))
    assert(combos.map(c => (c.params("a"), c.params("b"))) === Seq((1, "x"), (2, "y")))
  }

  test("concatView unions combo outputs with param literal columns") {
    val d0 = Seq((1L, 1.0)).toDF("id", "out")
    val d1 = Seq((2L, 2.0)).toDF("id", "out")
    val view = FeatureExpansion.concatView(Seq(
      Map[String, Any]("bin" -> 10) -> d0, Map[String, Any]("bin" -> 20) -> d1))
    assert(view.count() === 2)
    assert(view.filter(col("bin") === 20).select("id").collect()(0).getLong(0) === 2L)
  }

  test("groupbyIter/groupbyExcept/groupbyApply: lazy per-group frames in key order") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 1L, 5.0), ("c", 9L, 1.0)
    ).toDF("cls", "trial", "v")
    val seen = df.etl.groupbyIter(Seq("cls")).map { case (k, g) =>
      (k.getString(0), g.count(), g.agg(sum("v")).head().getDouble(0))
    }.toSeq
    assert(seen === Seq(("a", 2L, 30.0), ("b", 1L, 5.0), ("c", 1L, 1.0)))
    // groupby_except: all columns except the data ones
    val keys = df.etl.groupbyExcept(Seq("trial", "v")).map(_._1.getString(0)).toSeq
    assert(keys === Seq("a", "b", "c"))
    // per-group transform unioned as one frame
    val out = df.etl.groupbyApply(Seq("cls")) { (k, g) =>
      g.agg(count(lit(1)).as("n")).withColumn("cls", lit(k.getString(0)))
    }
    assert(out.orderBy("cls").collect().map(r => (r.getString(1), r.getLong(0))).toSeq
      === Seq(("a", 2L), ("b", 1L), ("c", 1L)))
    // null group keys survive the round trip
    val withNull = Seq((null.asInstanceOf[String], 1L), ("x", 2L)).toDF("g", "k")
    val gs = withNull.etl.groupbyIter(Seq("g")).map { case (k, g) => (k.get(0), g.count()) }.toSeq
    assert(gs.toSet === Set((null, 1L), ("x", 1L)))
  }

  test("groupbyIter supports array-typed grouping keys") {
    val df = Seq(
      (Seq(1, 2), "a"), (Seq(1, 2), "b"), (Seq(3), "c")
    ).toDF("ks", "v")
    val seen = df.etl.groupbyIter(Seq("ks")).map { case (k, g) =>
      (k.getSeq[Int](0), g.count())
    }.toSeq
    assert(seen === Seq((Seq(1, 2), 2L), (Seq(3), 1L)))
  }

  test("iter/iterdict/itertuples stream rows in the requested order") {
    val df = Seq((3L, "c"), (1L, "a"), (2L, "b")).toDF("id", "v")
      .repartition(3) // multiple partitions: toLocalIterator must still order
    assert(df.etl.itertuples(orderBy = Seq("id")).map(_.getString(1)).toSeq
      === Seq("a", "b", "c"))
    assert(df.etl.iter(orderBy = Seq("id")).map { case (i, r) => (i, r.getLong(0)) }.toSeq
      === Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    val dicts = df.etl.iterdict(orderBy = Seq("id")).toSeq
    assert(dicts.head === Map("id" -> 1L, "v" -> "a"))
    assert(dicts.map(_("v")) === Seq("a", "b", "c"))
    // unordered form still yields every row exactly once
    assert(df.etl.itertuples().map(_.getLong(0)).toSeq.sorted === Seq(1L, 2L, 3L))
  }
}
