package graft.engine

import graft.SparkSuite
import org.apache.spark.sql.functions._


/** Scale pattern: bucketing co-locates a repeated big-big join so it runs
  * with NO shuffle exchange — the layout a 100 TB report⋈nodes pipeline
  * would use (write once bucketed by the join key, every later join is
  * exchange-free). Asserted on the physical plan.
  */
class BucketedJoinSpec extends SparkSuite {

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    // a previously failed run can leave the managed location behind
    for (t <- Seq("li_bucketed", "ord_bucketed")) {
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        loc.listFiles().foreach(_.delete()); loc.delete()
      }
    }
    // force the shuffled-join path (at real scale both sides exceed the
    // broadcast threshold anyway — that's the case bucketing exists for)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    graft.Tables.lineitem(spark, sf0001)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    graft.Tables.orders(spark, sf0001)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(sum("l_quantity").as("q"))
    val plan = joined.queryExecution.executedPlan.toString

    // the join itself must not re-shuffle either side: the only Exchange
    // allowed is the one for the final groupBy
    val joinPart = plan.split("HashAggregate").last // below the agg
    assert(joinPart.contains("SortMergeJoin") || joinPart.contains("ShuffledHashJoin"),
      s"expected a non-broadcast join over bucketed tables:\n$plan")
    assert(!joinPart.contains("Exchange"),
      s"bucketed join must not shuffle its inputs:\n$plan")
    assert(joined.count() > 0)

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
