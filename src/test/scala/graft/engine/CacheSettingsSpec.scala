package graft.engine

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The `cache:` config block (reference CacheConfig): path wins over the
  * deprecated output, clear wipes before attach, skip_features computes but
  * never writes feature files, clear+readonly rejected.
  */
class CacheSettingsSpec extends SparkSuite {

  private def fixture(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cachecfg").toString
    (1 to 50).map(k => (k * 10.0, (k % 4).toLong))
      .toDF("time", "gid").write.mode("overwrite").parquet(s"$dir/sim0")
    Seq(0L, 1L, 2L, 3L).toDF("gid").write.mode("overwrite").parquet(s"$dir/nodes")
    Files.writeString(Paths.get(dir, "campaign.yaml"),
      s"""name: c
         |attrs: {path_prefix: "$dir"}
         |data:
         |  - {simulation_path: sim0, circuit_path: "$dir/nodes"}
         |""".stripMargin)
    dir
  }

  private def analysisYaml(dir: String, cacheBlock: String): String = {
    val p = Paths.get(dir, s"analysis${cacheBlock.hashCode}.yaml")
    Files.writeString(p,
      s"""simulation_campaign: $dir/campaign.yaml
         |output: $dir/legacy_out
         |$cacheBlock
         |analysis:
         |  s:
         |    extraction:
         |      report: {type: spikes}
         |      neuron_classes: {all: {}}
         |      windows: {w: {bounds: [0, 1000]}}
         |    features:
         |      - groupby: [simulation_id, circuit_id, neuron_class, window]
         |        function: mean_firing_rates
         |""".stripMargin)
    p.toString
  }

  test("cache.path wins over deprecated output; skip_features writes no feature files") {
    val dir = fixture()
    val cfgPath = analysisYaml(dir,
      s"cache: {path: $dir/cache_root, skip_features: true}")
    val ma = MultiAnalyzer.fromFile(spark, cfgPath)
    try {
      ma.extractRepo()
      val feats = ma("s").calculateFeatures()
      assert(feats.values.forall(_.count() > 0))
      // repo frames cached under cache.path, not output
      assert(Files.exists(Paths.get(s"$dir/cache_root/s/repo/report.parquet")))
      assert(!Files.exists(Paths.get(s"$dir/legacy_out/s")))
      // features computed but never written (the features/ dir itself is
      // pre-created by the cache manager — it must stay empty)
      val featDir = Paths.get(s"$dir/cache_root/s/features")
      val entries = Files.list(featDir)
      try assert(entries.toArray.isEmpty) finally entries.close()
    } finally ma.close()
  }

  test("cache.bucket_gids: cached report is hash-clustered and joins co-located") {
    import graft.sources.Bucketed
    val dir = fixture()
    val cfgPath = analysisYaml(dir, s"cache: {path: $dir/bc, bucket_gids: 4}")
    val ma = MultiAnalyzer.fromFile(spark, cfgPath)
    try {
      ma.extractRepo()
      // the report landed as bucketed files (≤ 4; an empty bucket writes
      // no file — the fixture's 4 gids hash into 3 of the 4 buckets)
      val files = new java.io.File(s"$dir/bc/s/repo/report.parquet").listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
      assert(files.nonEmpty && files.length <= 4,
        s"expected <=4 bucket files, got ${files.length}")
      assert(files.forall(_.getName.matches("part-\\d+-.*_0000\\d\\..*parquet")),
        s"bucket id suffix missing: ${files.map(_.getName).toSeq}")
      // a served reload joins a co-bucketed dim with no shuffle exchange
      val report = ma("s").report
      spark.sql("DROP TABLE IF EXISTS cs_bdim")
      val bdim = java.nio.file.Files.createTempDirectory("graft-cs-bdim").toString
      Bucketed.write(
        report.select("gid").distinct().withColumn("k", col("gid") % 3),
        "cs_bdim", s"$bdim/d", 4, Seq("gid"))
      val j = report.hint("merge").join(Bucketed.table(spark, "cs_bdim").hint("merge"), "gid")
      assert(!Bucketed.hasShuffle(j),
        s"bucket_gids cache lost co-location:\n${j.queryExecution.executedPlan}")
      assert(j.count() > 0)
      spark.sql("DROP TABLE IF EXISTS cs_bdim")
    } finally ma.close()
  }

  test("bucket_gids on a non-parquet store is rejected at config parse") {
    val dir = fixture()
    val cfgPath = analysisYaml(dir,
      s"cache: {path: $dir/bad, store_type: feather, bucket_gids: 4}")
    intercept[IllegalArgumentException] { MultiAnalyzer.fromFile(spark, cfgPath) }
  }

  test("cache.clear wipes the analysis cache before attaching") {
    val dir = fixture()
    val keep = analysisYaml(dir, s"cache: {path: $dir/cc}")
    val ma1 = MultiAnalyzer.fromFile(spark, keep)
    try ma1.extractRepo() finally ma1.close()
    val marker = Paths.get(s"$dir/cc/s/STALE_MARKER")
    Files.writeString(marker, "old")
    val ma2 = MultiAnalyzer.fromFile(spark, analysisYaml(dir, s"cache: {path: $dir/cc, clear: true}"))
    try {
      ma2.extractRepo()
      assert(!Files.exists(marker)) // old content wiped
      assert(Files.exists(Paths.get(s"$dir/cc/s/repo/report.parquet"))) // rebuilt
    } finally ma2.close()
  }

  test("clear + readonly is rejected, matching the reference validator") {
    intercept[IllegalArgumentException] {
      CacheSettings(clear = true, readonly = true)
    }
  }
}
