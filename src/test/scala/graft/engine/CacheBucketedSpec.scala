package graft.engine

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** S9 store family + Bucketed: a cache frame declared hash-clustered
  * (e.g. the report by gid) is written ONCE through the clustering
  * shuffle and reloaded — in this or a later session — with the bucket
  * spec re-attached through the catalog, so every downstream join on gid
  * runs exchange-free. The 100 TB campaign-cache layout.
  */
class CacheBucketedSpec extends SparkSuite {

  test("bucketed cache frame: write, cross-manager reload, exchange-free join") {
    import graft.sources.Bucketed
    val dir = java.nio.file.Files.createTempDirectory("graft-cache-bucketed").toString
    val spec = Map("repo/report" -> ((4, Seq("gid"))))

    val report = graft.Tables.spikes(spark, sf0001).select("gid", "time", "value")
    val cm = new CacheManager(spark, dir, bucketSpec = spec)
    val served = cm.loadOrCompute("repo", "report", "chain-v1", report)
    assert(served.count() == report.count())
    cm.close()

    // co-bucketed dimension to join against
    val base = java.nio.file.Files.createTempDirectory("graft-cache-bdim").toString
    spark.sql("DROP TABLE IF EXISTS cb_dim")
    Bucketed.write(report.select("gid").distinct().withColumn("k", col("gid") % 5),
      "cb_dim", s"$base/dim", 4, Seq("gid"))

    val j1 = served.hint("merge").join(Bucketed.table(spark, "cb_dim").hint("merge"), "gid")
    assert(!Bucketed.hasShuffle(j1),
      s"cached bucketed frame lost co-location:\n${j1.queryExecution.executedPlan}")

    // simulate a fresh session: the catalog forgets the cache table, the
    // manifest + files stay; a second manager must LOAD (not recompute)
    // and re-register the bucket spec
    spark.sessionState.catalog.listTables("default")
      .filter(_.table.startsWith("graft_cache_"))
      .foreach(t => spark.sql(s"DROP TABLE `${t.table}`"))
    val cm2 = new CacheManager(spark, dir, bucketSpec = spec)
    val reloaded = cm2.loadOrCompute("repo", "report", "chain-v1",
      sys.error("stale: should have served the cached bucketed frame"))
    assert(reloaded.count() == report.count())
    val j2 = reloaded.hint("merge").join(Bucketed.table(spark, "cb_dim").hint("merge"), "gid")
    assert(!Bucketed.hasShuffle(j2),
      s"reloaded cache frame lost co-location:\n${j2.queryExecution.executedPlan}")
    cm2.close()
    spark.sql("DROP TABLE IF EXISTS cb_dim")
  }

  test("changing the bucket count over a warm cache REBUILDS instead of mis-registering") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cache-rebucket").toString
    val report = graft.Tables.spikes(spark, sf0001).select("gid", "time").limit(500)
    val cm4 = new CacheManager(spark, dir,
      bucketSpec = Map("repo/report" -> ((4, Seq("gid")))))
    cm4.loadOrCompute("repo", "report", "chain-v1", report).count()
    cm4.close()
    // same config chain, different bucket count: a re-register of 8 over
    // 4-bucket files would silently drop join rows — the layout is part
    // of the invalidation chain, so this must RECOMPUTE
    var recomputed = false
    val cm8 = new CacheManager(spark, dir,
      bucketSpec = Map("repo/report" -> ((8, Seq("gid")))))
    spark.sessionState.catalog.listTables("default")
      .filter(_.table.startsWith("graft_cache_"))
      .foreach(t => spark.sql(s"DROP TABLE `${t.table}`"))
    val served = cm8.loadOrCompute("repo", "report", "chain-v1",
      { recomputed = true; report })
    assert(served.count() == report.count())
    assert(recomputed, "bucket-count change must invalidate the cached frame")
    cm8.close()
  }

  test("bucketSpec is refused on non-parquet stores") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cache-bad").toString
    intercept[IllegalArgumentException] {
      new CacheManager(spark, dir, storeType = "feather",
        bucketSpec = Map("repo/report" -> ((4, Seq("gid")))))
    }
  }
}
