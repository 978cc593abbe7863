package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The binned large-large range join must (a) agree exactly with the naive
  * theta join, (b) handle intervals longer than the bin width, and (c)
  * plan as a hash/sort-merge equi-join — never a nested loop.
  */
class RangeJoinSpec extends SparkSuite {

  private lazy val fixture: (String, String) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-rj").toString
    val rnd = new scala.util.Random(7)
    (0 until 2000).map(i => (i.toLong % 13, rnd.nextDouble() * 1000.0))
      .toDF("k", "t").write.mode("overwrite").parquet(s"$dir/events")
    // intervals of mixed lengths, some far longer than others
    (0 until 200).map { i =>
      val lo = rnd.nextDouble() * 900.0
      (i.toLong % 13, lo, lo + (if (i % 7 == 0) 300.0 else rnd.nextDouble() * 40.0))
    }.toDF("k", "lo", "hi").write.mode("overwrite").parquet(s"$dir/iv")
    (s"$dir/events", s"$dir/iv")
  }

  test("binned join equals the naive theta join (auto and explicit width)") {
    val (evP, ivP) = fixture
    val ev = spark.read.parquet(evP)
    val iv = spark.read.parquet(ivP)
    val naive = ev.as("e").join(iv.as("i"),
      col("e.k") === col("i.k") && col("e.t") >= col("i.lo") && col("e.t") < col("i.hi"))
      .select(col("e.k"), col("e.t"), col("i.lo"), col("i.hi"))
    for (width <- Seq(None, Some(50.0))) { // 50 < longest interval (300)
      val binned = RangeJoin.binned(ev, "t", iv, "lo", "hi", Seq("k"), width)
        .select("k", "t", "lo", "hi")
      assert(binned.count() === naive.count(), s"width=$width")
      assert(binned.except(naive).count() === 0 && naive.except(binned).count() === 0,
        s"width=$width")
    }
  }

  test("plans as an equi-join: no nested loop even with broadcast disabled") {
    val (evP, ivP) = fixture
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val plan = RangeJoin.binned(
        spark.read.parquet(evP), "t", spark.read.parquet(ivP), "lo", "hi",
        Seq("k"), Some(100.0)).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    } finally spark.conf.set(key, saved)
  }
}
