package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class VictorPurpuraSpec extends AnyFunSuite {

  import VictorPurpura.distance

  test("base cases: empty trains cost = insertions/deletions") {
    assert(distance(Array.empty, Array.empty, 1.0) === 0.0)
    assert(distance(Array(1.0, 2.0), Array.empty, 1.0) === 2.0)
    assert(distance(Array.empty, Array(1.0, 2.0, 3.0), 1.0) === 3.0)
  }

  test("identical trains have distance 0; q=0 degenerates to count diff") {
    assert(distance(Array(1.0, 5.0, 9.0), Array(1.0, 5.0, 9.0), 0.5) === 0.0)
    assert(distance(Array(1.0, 2.0, 3.0), Array(100.0, 200.0), 0.0) === 1.0)
  }

  test("small shift costs q*dt when cheaper than delete+insert") {
    // one spike moved by 0.5 with q=1: move cost 0.5 < 2.0
    assert(distance(Array(1.0), Array(1.5), 1.0) === 0.5)
    // moved far: delete+insert (2.0) wins
    assert(distance(Array(1.0), Array(100.0), 1.0) === 2.0)
  }

  test("properties: symmetry, non-negativity, bounded by n+m") {
    val genTrain = Gen.listOf(Gen.chooseNum(0.0, 100.0)).map(_.sorted.toArray)
    val prop = Prop.forAll(genTrain, genTrain, Gen.chooseNum(0.01, 2.0)) {
      (a: Array[Double], b: Array[Double], q: Double) =>
        val d1 = distance(a, b, q)
        val d2 = distance(b, a, q)
        math.abs(d1 - d2) < 1e-9 && d1 >= 0 && d1 <= a.length + b.length + 1e-9
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(100))
    assert(res.passed, res.status.toString)
  }
}

/** The codegen vp_distance Expression: equality with the kernel, null
  * handling, and a UDF-free plan.
  */
class VictorPurpuraExprSpec extends graft.SparkSuite {
  import org.apache.spark.sql.functions._

  test("vp_distance expression matches the kernel and stays codegen") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(1.5, 2.5)),
      (Seq.empty[Double], Seq(4.0)),
      (Seq(10.0), Seq(10.0))).toDF("a", "b")
      // parquet round-trip so the plan is not constant-folded locally
    val q = 0.5
    val got = df.select(expr(s"vp_distance(a, b, ${q}d)").as("d")).collect().map(_.getDouble(0))
    val want = Seq(
      VictorPurpura.distance(Array(1.0, 2.0, 3.0), Array(1.5, 2.5), q),
      VictorPurpura.distance(Array.empty, Array(4.0), q),
      VictorPurpura.distance(Array(10.0), Array(10.0), q))
    assert(got.toSeq === want)
    // null in → null out
    val n = spark.sql(s"SELECT vp_distance(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d), ${q}d)")
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("a16b-shaped plan contains no ScalaUDF / BatchEvalPython node") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-vp").toString
    Seq((1L, Seq(1.0, 2.0)), (2L, Seq(2.0, 3.0)), (3L, Seq(9.0)))
      .toDF("gid", "train").write.mode("overwrite").parquet(dir)
    val trains = spark.read.parquet(dir)
    val t2 = trains.select(col("gid").as("gid2"), col("train").as("train2"))
    val out = trains.join(t2, col("gid") < col("gid2"))
      .select(col("gid"), col("gid2"), expr("vp_distance(train, train2, 0.5d)").as("vp"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"), plan)
    assert(out.count() === 3)
  }
}
