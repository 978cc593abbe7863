package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The bounded top-k aggregate behind every ANN selection: exact
  * equivalence with the rank-window form it replaces, under the
  * conditions that exercise its partial-aggregation machinery —
  * many-partition inputs (map-side buffers merged), ties, groups
  * smaller than k, and duplicate scores.
  */
class TopKBySpec extends SparkSuite {

  private def registered() = {
    GraftFunctions.register(spark)
    spark
  }

  test("topk_by equals the row_number window on a many-partition input") {
    registered()
    import org.apache.spark.sql.expressions.Window
    // 64 partitions so partial buffers genuinely merge; scores collide
    // (s = id % 97) so tie-breaking by id is exercised throughout
    val df = spark.range(0, 20000, 1, 64)
      .select(
        (col("id") % 13).as("g"),
        (col("id") % 97).cast("double").as("s"),
        col("id"))
    val viaAgg = df.groupBy("g")
      .agg(expr("topk_by(s, id, 5)").as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), col("t.id").as("id"),
        (col("pos") + 1).cast("int").as("rk"), col("t.score").as("s"))
    val w = Window.partitionBy("g").orderBy(col("s"), col("id"))
    val viaWindow = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5).select("g", "id", "rk", "s")
    assert(viaAgg.count() === viaWindow.count())
    assert(viaAgg.except(viaWindow).isEmpty && viaWindow.except(viaAgg).isEmpty)
  }

  test("groups smaller than k return all their rows, ascending") {
    registered()
    import spark.implicits._
    val df = Seq((1L, 3.0, 10L), (1L, 1.0, 11L), (2L, 2.0, 20L))
      .toDF("g", "s", "id")
    val rows = df.groupBy("g").agg(expr("topk_by(s, id, 5)").as("top"))
      .select(col("g"), col("top")).collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)).toMap
    assert(rows(1L).map(_.getDouble(0)) === Seq(1.0, 3.0))
    assert(rows(1L).map(_.getLong(1)) === Seq(11L, 10L))
    assert(rows(2L).map(_.getLong(1)) === Seq(20L))
  }

  test("identical scores keep the k smallest ids deterministically") {
    registered()
    val df = spark.range(0, 1000, 1, 32)
      .select(lit(0L).as("g"), lit(1.0).as("s"), col("id"))
    val top = df.groupBy("g").agg(expr("topk_by(s, id, 4)").as("top"))
      .select(explode(col("top")).as("t")).select(col("t.id"))
      .collect().map(_.getLong(0)).toSeq
    assert(top === Seq(0L, 1L, 2L, 3L))
  }

  test("null scores are skipped, not ranked") {
    registered()
    import spark.implicits._
    val df = Seq((1L, Some(2.0), 1L), (1L, None, 2L), (1L, Some(1.0), 3L))
      .toDF("g", "s", "id")
    val ids = df.groupBy("g").agg(expr("topk_by(s, id, 3)").as("top"))
      .select(explode(col("top")).as("t")).select(col("t.id"))
      .collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(3L, 1L))
  }

  test("NaN scores rank last, matching the window's sort order") {
    registered()
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // NaN arrives first (so a naive primitive-< buffer would pin it at
    // rank 1), plus a NaN-vs-NaN tie; Spark orders NaN greater than
    // every double including +Inf, equal to itself
    val df = Seq(
      (1L, Double.NaN, 9L), (1L, 5.0, 1L), (1L, Double.NaN, 8L),
      (1L, 1.0, 2L), (1L, Double.PositiveInfinity, 3L), (1L, 3.0, 4L))
      .toDF("g", "s", "id").repartition(4)
    val viaAgg = df.groupBy("g").agg(expr("topk_by(s, id, 5)").as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("t.id")).collect().map(_.getLong(0)).toSeq
    val w = Window.partitionBy("g").orderBy(col("s"), col("id"))
    val viaWindow = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5).orderBy("rk")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(viaAgg === viaWindow)
    assert(viaAgg === Seq(2L, 4L, 1L, 3L, 8L))
  }

  test("a foldable NULL k fails type-check cleanly, not with an NPE") {
    registered()
    val df = spark.range(3).select(lit(0L).as("g"), lit(1.0).as("s"), col("id"))
    val e = intercept[Exception] {
      df.groupBy("g").agg(expr("topk_by(s, id, cast(null as int))")).collect()
    }
    assert(!e.isInstanceOf[NullPointerException])
  }

  test("non-literal or non-positive k is rejected at analysis") {
    registered()
    val df = spark.range(3).select(lit(0L).as("g"), lit(1.0).as("s"), col("id"))
    intercept[Exception] {
      df.groupBy("g").agg(expr("topk_by(s, id, 0)")).collect()
    }
    intercept[Exception] {
      df.groupBy("g").agg(expr("topk_by(s, id, cast(id as int))")).collect()
    }
  }
}
