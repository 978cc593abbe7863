package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Price the compaction threshold: co-bucketed sort-merge-join cost as a
  * function of files-per-bucket on the fact side. Builds a bucketed
  * store from the documents table's signature rows, appends N-1 delta
  * waves (each adds one file per touched bucket), measures the probe
  * join at each fragmentation level, then compacts and measures again —
  * the row [[graft.sources.Bucketed.compactBuckets]]'s maxFiles default
  * is sized from. Run with the trusted-sort conf ON and OFF: with it on
  * (the serving posture) 1 file/bucket additionally drops the
  * per-partition Sort under the merge join; with it off the cost curve
  * isolates the pure many-small-files open/seek overhead.
  *
  * Usage: runMain graft.tools.BucketCompactProfile <sfDir> [waves=6]
  */
object BucketCompactProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val waves = if (args.length > 1) args(1).toInt else 6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Bucketed

    val docs = graft.Tables.documents(spark, dir)
    val buckets = graft.queries.Text.indexBucketsForTesting(docs.count())
    val sigs = graft.queries.Text.rowLshKeys(docs).cache()
    sigs.count()
    val probe = sigs.withColumnRenamed("doc_id", "doc2")
      .repartition(buckets, col("bk")).cache()
    probe.count()

    val tok = java.lang.Long.toHexString(
      java.util.concurrent.ThreadLocalRandom.current().nextLong())
    val name = s"graft_compact_prof_$tok"
    val path = s"${System.getProperty("java.io.tmpdir")}/$name"
    graft.engine.TempReaper.register(path)

    def joinSecs(reps: Int = 3): Double = {
      val t = Bucketed.table(spark, name).hint("merge")
      (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        t.join(probe.hint("merge"), "bk").count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    for (trusted <- Seq(false, true)) {
      spark.sql(s"DROP TABLE IF EXISTS `$name`")
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(path))
      spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", trusted.toString)
      println(s"[compact] trustedSort=$trusted buckets=$buckets " +
        s"rows=${sigs.count()}")
      // wave 0 = the pristine build; each further wave re-appends the
      // same signature rows (content is irrelevant to the file-count
      // cost curve; identical volume per wave keeps the row-work flat
      // so the measured delta is the fragmentation alone)
      Bucketed.write(sigs, name, path, buckets, Seq("bk"), Seq("bk", "doc_id"))
      for (w <- 1 to waves) {
        val fpb = Bucketed.bucketFileCounts(spark, name).values.max
        println(f"[compact] files_per_bucket=$fpb%2d join=${joinSecs()}%.3f s " +
          f"rows_scanned=${w}x")
        if (w < waves) Bucketed.append(sigs, name, buckets, Seq("bk"))
      }
      val t0 = System.nanoTime()
      val n = Bucketed.compactBuckets(spark, name)
      val cSec = (System.nanoTime() - t0) / 1e9
      println(f"[compact] compacted $n buckets in $cSec%.2f s; " +
        f"post-compact join=${joinSecs()}%.3f s " +
        f"(files_per_bucket=${Bucketed.bucketFileCounts(spark, name).values.max})")
    }
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    spark.stop()
  }
}
