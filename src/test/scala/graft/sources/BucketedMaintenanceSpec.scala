package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The bucketed stores' maintenance protocol (VERDICT r19 missing #2/#3):
  * cross-process serialization of write/append/register through the
  * shared [[graft.engine.RootLock]], and the surgical commit-marker
  * compaction that restores one file per bucket — the state Spark
  * requires before it trusts the written per-bucket sort (with >1 file
  * per bucket, co-bucketed sort-merge joins re-SORT every partition on
  * every query; after compaction the scan reports its sort order and the
  * join runs sort-free AND exchange-free).
  */
class BucketedMaintenanceSpec extends SparkSuite {

  private def mkRows(n: Int, offset: Long = 0L) = {
    import spark.implicits._
    (0 until n).map(i => (offset + i, s"v${offset + i}"))
      .toDF("k", "v")
  }

  private def freshName(): (String, String) = {
    val tok = java.lang.Long.toHexString(
      java.util.concurrent.ThreadLocalRandom.current().nextLong())
    val name = s"graft_bmaint_$tok"
    (name, s"${System.getProperty("java.io.tmpdir")}/$name")
  }

  private def cleanup(name: String, path: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    spark.sql(s"DROP TABLE IF EXISTS `${name}__compact`")
    graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(path))
  }

  private def sortNodes(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.toString.linesIterator
      .count(_.contains("- Sort "))

  test("compaction restores one file per bucket and the sort-free merge join") {
    val (name, path) = freshName()
    val (dim, dimPath) = freshName()
    // the scan reports the written per-bucket sort only behind this conf
    // (it prices a planning-time file listing) AND only when every bucket
    // holds at most one file — the exact state compaction restores, and
    // the guard that makes the conf safe to enable (SPARK-28595's
    // wrong-order hazard was multi-file buckets, which now report Nil)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      Bucketed.write(mkRows(64), name, path, 4, Seq("k"))
      Bucketed.append(mkRows(32, 64), name, 4, Seq("k"))
      Bucketed.append(mkRows(32, 96), name, 4, Seq("k"))
      val pre = Bucketed.bucketFileCounts(spark, name)
      assert(pre.values.exists(_ > 1),
        s"appends did not fragment any bucket: $pre")
      // co-bucketed single-file dim: pre-compact the fact side's multi-
      // file buckets force a per-partition Sort under the merge join
      Bucketed.write(mkRows(128).select(col("k")), dim, dimPath, 4, Seq("k"))
      def join() = Bucketed.table(spark, name).hint("merge")
        .join(Bucketed.table(spark, dim).hint("merge"), "k")
      val before = join()
      assert(!Bucketed.hasShuffle(before), "co-bucketed join shuffled")
      assert(sortNodes(before) > 0,
        s"expected a re-sort over fragmented buckets:\n" +
          before.queryExecution.executedPlan)
      val want = Bucketed.table(spark, name).collect().toSeq
        .map(r => (r.getLong(0), r.getString(1))).sorted

      val compacted = Bucketed.compactBuckets(spark, name)
      assert(compacted == pre.count(_._2 > 1),
        s"compacted $compacted buckets, expected ${pre.count(_._2 > 1)}")
      val post = Bucketed.bucketFileCounts(spark, name)
      assert(post.values.forall(_ == 1), s"buckets still fragmented: $post")
      val got = Bucketed.table(spark, name).collect().toSeq
        .map(r => (r.getLong(0), r.getString(1))).sorted
      assert(got == want, "compaction changed the row multiset")
      // protocol leftovers must be gone
      val left = new java.io.File(path).list().toSeq
      assert(!left.exists(n => n.startsWith("_old_") ||
          n == "_compact_commit" || n == "__compact"),
        s"protocol state leaked: $left")
      // and the join is now sort-free (single file per bucket on both
      // sides → the scan's reported ordering satisfies the merge join)
      val after = join()
      assert(!Bucketed.hasShuffle(after), "compaction broke co-location")
      assert(sortNodes(after) == 0,
        s"merge join still re-sorts after compaction:\n" +
          after.queryExecution.executedPlan)
      // idempotent: nothing left to compact
      assert(Bucketed.compactBuckets(spark, name) == 0)
    } finally {
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      cleanup(name, path); cleanup(dim, dimPath)
    }
  }

  test("crash BEFORE commit: recovery restores retired files, drops temp garbage") {
    val (name, path) = freshName()
    try {
      Bucketed.write(mkRows(64), name, path, 4, Seq("k"))
      Bucketed.append(mkRows(32, 64), name, 4, Seq("k"))
      val want = Bucketed.table(spark, name).count()
      // simulate: a retire crashed mid-way (one live file behind the
      // _old_ veil, NO commit marker), with a half-written temp table
      val dir = new java.io.File(path)
      val one = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
      assert(one.renameTo(new java.io.File(dir, "_old_" + one.getName)))
      val tmp = new java.io.File(dir, "__compact")
      tmp.mkdirs()
      java.nio.file.Files.writeString(
        tmp.toPath.resolve("garbage.parquet"), "not parquet")
      spark.catalog.refreshTable(name)
      // next maintenance entry recovers BACKWARD (no marker ⇒ the commit
      // never happened): _old_ restored, temp dropped, rows intact
      assert(Bucketed.compactBuckets(spark, name, maxFiles = 99) == 0)
      spark.catalog.refreshTable(name)
      assert(Bucketed.table(spark, name).count() == want,
        "pre-commit crash recovery lost rows")
      val left = dir.list().toSeq
      assert(!left.exists(n => n.startsWith("_old_") || n == "__compact"),
        s"recovery left crash state: $left")
    } finally cleanup(name, path)
  }

  test("crash AFTER commit (marker present): recovery rolls forward") {
    val (name, path) = freshName()
    try {
      Bucketed.write(mkRows(64), name, path, 4, Seq("k"))
      Bucketed.append(mkRows(32, 64), name, 4, Seq("k"))
      val want = Bucketed.table(spark, name).collect().toSeq
        .map(r => (r.getLong(0), r.getString(1))).sorted
      // replay the real protocol up to the crash point: temp table holds
      // ALL the needy buckets' rows (here: everything), old files are
      // fully retired, the commit marker exists — then the process dies
      val dir = new java.io.File(path)
      // the temp table is built exactly as rewriteBuckets builds it: a
      // PLAIN parquet read of the needy files re-shuffled to the bucket
      // hash (a catalog-table scan here could hand the write an input
      // partitioning that fragments buckets across tasks — correct
      // contents, but not the one-file-per-bucket layout the protocol
      // restores)
      Bucketed.write(
        spark.read.schema(Bucketed.table(spark, name).schema).parquet(
          dir.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(_.toString): _*),
        s"${name}__compact", s"$path/__compact", 4, Seq("k"))
      dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .foreach(f => assert(
          f.renameTo(new java.io.File(dir, "_old_" + f.getName))))
      java.nio.file.Files.createFile(dir.toPath.resolve("_compact_commit"))
      spark.catalog.refreshTable(name)
      // next maintenance entry rolls FORWARD: temp files move in, the
      // retirees and the marker drop, content is the compacted multiset
      assert(Bucketed.compactBuckets(spark, name, maxFiles = 99) == 0)
      val got = Bucketed.table(spark, name).collect().toSeq
        .map(r => (r.getLong(0), r.getString(1))).sorted
      assert(got == want, "post-commit crash recovery lost rows")
      assert(Bucketed.bucketFileCounts(spark, name).values.forall(_ == 1),
        s"roll-forward did not complete the compaction: " +
          s"${Bucketed.bucketFileCounts(spark, name)} files=" +
          dir.list().toSeq.sorted.mkString(","))
      val left = dir.list().toSeq
      assert(!left.exists(n => n.startsWith("_old_") ||
          n == "_compact_commit" || n == "__compact"),
        s"roll-forward left crash state: $left")
    } finally cleanup(name, path)
  }

  test("append waits for a cross-process holder of the store's root lock") {
    val (name, path) = freshName()
    try {
      Bucketed.write(mkRows(16), name, path, 2, Seq("k"))
      val lockPath = s"$path/.maintlock"
      val marker = s"$path/.holder_up"
      // process 2: python's fcntl.lockf issues the same F_SETLK record
      // locks FileChannel.lock maps to on Linux — real two-process
      // contention minus a second Spark boot (the IvfRootFlockSpec move)
      val holder = new ProcessBuilder("python3", "-c",
        s"""
           |import fcntl, time, pathlib
           |f = open("$lockPath", "w")
           |fcntl.lockf(f, fcntl.LOCK_EX)
           |pathlib.Path("$marker").touch()
           |time.sleep(2.0)
           |fcntl.lockf(f, fcntl.LOCK_UN)
           |""".stripMargin).inheritIO().start()
      try {
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        while (!new java.io.File(marker).exists()) {
          assert(System.nanoTime() < deadline, "holder process never came up")
          Thread.sleep(20)
        }
        val t0 = System.nanoTime()
        Bucketed.append(mkRows(8, 16), name, 2, Seq("k"))
        val sec = (System.nanoTime() - t0) / 1e9
        assert(sec >= 1.0,
          f"append returned after $sec%.2f s while another process held " +
            "the store's root lock — cross-process exclusion not engaging")
        assert(Bucketed.table(spark, name).count() == 24)
      } finally holder.destroyForcibly()
    } finally cleanup(name, path)
  }
}
