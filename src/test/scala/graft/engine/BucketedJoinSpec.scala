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

  test("Bucketed.write: external tables, one file per bucket, exchange-free join, exact rows") {
    import graft.sources.Bucketed
    val base = java.nio.file.Files.createTempDirectory("graft-bucketed-spec").toString
    spark.sql("DROP TABLE IF EXISTS b_spec_li")
    spark.sql("DROP TABLE IF EXISTS b_spec_ord")

    val li = graft.Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_quantity", "l_returnflag")
    val ord = graft.Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_orderstatus")
    Bucketed.write(li, "b_spec_li", s"$base/li", 4, Seq("l_orderkey"))
    Bucketed.write(ord.withColumnRenamed("o_orderkey", "l_orderkey"),
      "b_spec_ord", s"$base/ord", 4, Seq("l_orderkey"))

    // one file per bucket: the pre-repartition by the bucket hash means
    // each of the 4 buckets lands in exactly one data file
    for (sub <- Seq("li", "ord")) {
      val files = new java.io.File(s"$base/$sub").listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      assert(files.length == 4, s"$sub: expected 4 bucket files, got ${files.length}")
    }

    // merge hint forces the shuffled-join path (the 100 TB case) without
    // touching session conf; co-bucketing must remove both exchanges
    val joined = Bucketed.table(spark, "b_spec_li").hint("merge")
      .join(Bucketed.table(spark, "b_spec_ord").hint("merge"), "l_orderkey")
    assert(!Bucketed.hasShuffle(joined),
      s"co-bucketed join shuffled:\n${joined.queryExecution.executedPlan}")

    // exact result parity with the plain (unbucketed) join
    val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    val bucketed = joined
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty,
      "bucketed join result differs from plain join")

    spark.sql("DROP TABLE IF EXISTS b_spec_li")
    spark.sql("DROP TABLE IF EXISTS b_spec_ord")
  }

  test("Bucketed.register re-attaches an on-disk store with the bucket spec intact") {
    import graft.sources.Bucketed
    val base = java.nio.file.Files.createTempDirectory("graft-bucketed-reg").toString
    spark.sql("DROP TABLE IF EXISTS b_reg_a")
    spark.sql("DROP TABLE IF EXISTS b_reg_b")
    val li = graft.Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_quantity")
    Bucketed.write(li, "b_reg_a", s"$base/a", 4, Seq("l_orderkey"))
    val schema = spark.table("b_reg_a").schema
    // simulate a fresh session: the catalog forgets the table, the files stay
    spark.sql("DROP TABLE b_reg_a")
    val a = Bucketed.register(spark, "b_reg_a", s"$base/a", 4, Seq("l_orderkey"), schema)
    assert(a.count() == li.count(), "re-registered store lost rows")
    // the re-attached table must still join exchange-free against a
    // co-bucketed peer — i.e. the bucket spec survived re-registration
    Bucketed.write(li.groupBy("l_orderkey").count(), "b_reg_b", s"$base/b", 4, Seq("l_orderkey"))
    val joined = a.hint("merge")
      .join(Bucketed.table(spark, "b_reg_b").hint("merge"), "l_orderkey")
    assert(!Bucketed.hasShuffle(joined),
      s"re-registered bucketed join shuffled:\n${joined.queryExecution.executedPlan}")
    // and an UNregistered plain-parquet read of the same files would shuffle
    val plainRead = spark.read.parquet(s"$base/a").hint("merge")
      .join(Bucketed.table(spark, "b_reg_b").hint("merge"), "l_orderkey")
    assert(Bucketed.hasShuffle(plainRead),
      "control failed: plain read of bucketed files should shuffle")
    spark.sql("DROP TABLE IF EXISTS b_reg_a")
    spark.sql("DROP TABLE IF EXISTS b_reg_b")
  }

  test("j10 gate query matches the equivalent unbucketed plan") {
    val j10 = graft.SparkEntry.queries("j10_bucketed_colocated")(spark, sf0001)
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("user_id").as("gid"), col("value"))
    val dim = ev.select("gid").distinct().filter(col("gid") % 2 === 0)
      .withColumn("klass", col("gid") % 7)
    val plain = ev.join(dim, "gid").groupBy("klass")
      .agg(count(lit(1)).as("n"),
        graft.queries.dsum(col("value")).as("sum_value"))
      .select("klass", "n", "sum_value")
    assert(j10.exceptAll(plain).isEmpty && plain.exceptAll(j10).isEmpty,
      "j10 differs from the unbucketed restatement")
  }

  test("streamSideShuffles counts through AQE query stages post-execution") {
    import graft.sources.Bucketed
    val ev = graft.Tables.events(spark, sf0001)
    // a genuine stream-side shuffle (groupBy exchange outside any
    // broadcast subtree)
    val agg = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(Bucketed.streamSideShuffles(agg) >= 1,
      "pre-execution: the groupBy exchange must count")
    // EXECUTE the plan: AQE replaces exchanges with QueryStageExec
    // leaves — the count must survive (the ADVICE'd vacuous-0 bug)
    agg.collect()
    assert(Bucketed.streamSideShuffles(agg) >= 1,
      s"post-execution (AQE stages): the shuffle vanished from the " +
        s"count:\n${agg.queryExecution.executedPlan}")
    // and a broadcast-join plan stays 0 both ways — static-side
    // subtrees (incl. materialized BroadcastQueryStageExec) are exempt
    val dim = ev.select("user_id").distinct().limit(10)
    val bj = ev.join(broadcast(dim), "user_id")
    assert(Bucketed.streamSideShuffles(bj) == 0,
      "pre-execution: broadcast join must be stream-side map-only")
    bj.collect()
    assert(Bucketed.streamSideShuffles(bj) == 0,
      s"post-execution: broadcast stage wrongly counted:\n" +
        s"${bj.queryExecution.executedPlan}")
  }
}
