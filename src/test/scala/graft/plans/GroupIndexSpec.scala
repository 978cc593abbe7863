package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GroupIndex.dense must equal `row_number() over (partition by … order
  * by …) - 1` on unique keys, across partition-boundary layouts the
  * range shuffle actually produces.
  */
class GroupIndexSpec extends SparkSuite {
  import spark.implicits._

  private def windowIdx(df: org.apache.spark.sql.DataFrame,
      part: Seq[String], order: Seq[String]) = {
    val w = Window.partitionBy(part.map(col): _*).orderBy(order.map(col): _*)
    df.withColumn("idx", (row_number().over(w) - 1).cast("long"))
  }

  test("matches the window form on a low-cardinality key spanning many partitions") {
    // 3 groups × 10k rows each, shuffled input order, forced through 8
    // range partitions: every group spans several partitions
    val df = spark.range(30000)
      .select(
        concat(lit("g"), (col("id") % 3)).as("grp"),
        // unique per group, scrambled so input order ≠ output order
        pmod(col("id") * 2654435761L, lit(1000003L)).as("k"))
      .distinct()
    val expected = windowIdx(df, Seq("grp"), Seq("k"))
      .orderBy("grp", "k").collect().toSeq
    val got = GroupIndex.dense(df, Seq("grp"), Seq("k"), numPartitions = Some(8))
      .orderBy("grp", "k").collect().toSeq
    assert(got === expected)
  }

  test("multiple partition and order columns") {
    val df = Seq(
      (0, "a", 3.0, 1L), (0, "a", 1.0, 2L), (0, "b", 2.0, 3L),
      (1, "a", 2.0, 4L), (1, "a", 2.5, 5L), (1, "b", 0.5, 6L),
      (0, "a", 2.0, 7L), (1, "b", 9.0, 8L)
    ).toDF("c", "cls", "t", "id")
    val expected = windowIdx(df, Seq("c", "cls"), Seq("t", "id"))
      .orderBy("c", "cls", "t").collect().toSeq
    val got = GroupIndex.dense(df, Seq("c", "cls"), Seq("t", "id"),
        numPartitions = Some(3))
      .orderBy("c", "cls", "t").collect().toSeq
    assert(got === expected)
  }

  test("single group, more partitions than rows, empty frame") {
    val one = Seq(("x", 5L), ("x", 1L), ("x", 3L)).toDF("g", "k")
    assert(GroupIndex.dense(one, Seq("g"), Seq("k"), numPartitions = Some(16))
      .orderBy("k").select("idx").collect().map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
    val empty = Seq.empty[(String, Long)].toDF("g", "k")
    assert(GroupIndex.dense(empty, Seq("g"), Seq("k")).count() === 0)
  }

  test("binary (array-typed) partition keys group by value, not reference") {
    val df = Seq(
      (Array[Byte](1, 2), 30L), (Array[Byte](1, 2), 10L),
      (Array[Byte](3, 4), 20L), (Array[Byte](1, 2), 20L)
    ).toDF("g", "k")
    val got = GroupIndex.dense(df, Seq("g"), Seq("k"), numPartitions = Some(3))
      .select(hex(col("g")).as("g"), col("k"), col("idx"))
      .orderBy("g", "k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(
      ("0102", 10L, 0L), ("0102", 20L, 1L), ("0102", 30L, 2L),
      ("0304", 20L, 0L)))
  }

  test("indexes are dense and start at zero for every group") {
    val df = spark.range(5000)
      .select((col("id") % 7).as("g"), col("id").as("k"))
    val got = GroupIndex.dense(df, Seq("g"), Seq("k"), numPartitions = Some(5))
    val perGroup = got.groupBy("g")
      .agg(count(lit(1)).as("n"), min("idx").as("mn"), max("idx").as("mx"),
        countDistinct("idx").as("nd"))
      .collect()
    for (r <- perGroup) {
      assert(r.getLong(2) === 0L, s"group ${r.get(0)} min")
      assert(r.getLong(3) === r.getLong(1) - 1, s"group ${r.get(0)} max")
      assert(r.getLong(4) === r.getLong(1), s"group ${r.get(0)} distinct")
    }
  }
}
