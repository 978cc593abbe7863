package graft.engine

import graft.SparkSuite
import org.apache.hadoop.fs.Path

/** The lease-file protocol (VERDICT r18 missing #5): acquire / renew /
  * expire / steal / release semantics pinned against a REAL Hadoop
  * FileSystem (the local one — the API surface is identical across
  * implementations; what varies per store is only create-if-absent
  * atomicity, which Hadoop contracts guarantee) with a MOCKED clock so
  * expiry is driven, not slept for. Plus the maintenance wiring: with
  * the TTL knob set (and lease forced on a local root), stageInsert
  * coordinates through a .maintlease file instead of the flock.
  */
class LeaseSpec extends SparkSuite {

  private def fsAndDir() = {
    val dir = java.nio.file.Files.createTempDirectory("graft-lease").toString
    val p = new Path(dir, ".maintlease")
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p, dir)
  }

  test("acquire is exclusive while live; renew extends; release frees") {
    val (fs, p, dir) = fsAndDir()
    try {
      var t = 1000L
      val now = () => t
      assert(Lease.acquire(fs, p, "owner-a", 500L, now), "first acquire")
      assert(Lease.read(fs, p).contains(("owner-a", 1500L)))
      // a second owner cannot take a live lease
      assert(!Lease.acquire(fs, p, "owner-b", 500L, now))
      // re-entrant acquire by the holder renews
      t = 1200L
      assert(Lease.acquire(fs, p, "owner-a", 500L, now))
      assert(Lease.read(fs, p).contains(("owner-a", 1700L)))
      // renew extends from NOW, not from the old expiry
      t = 1400L
      assert(Lease.renew(fs, p, "owner-a", 500L, now))
      assert(Lease.read(fs, p).contains(("owner-a", 1900L)))
      // a non-holder cannot renew or release
      assert(!Lease.renew(fs, p, "owner-b", 500L, now))
      Lease.release(fs, p, "owner-b", now)
      assert(Lease.read(fs, p).isDefined, "non-holder release must not delete")
      Lease.release(fs, p, "owner-a", now)
      assert(Lease.read(fs, p).isEmpty, "holder release must delete")
      // after release anyone acquires
      assert(Lease.acquire(fs, p, "owner-b", 500L, now))
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(dir))
    }
  }

  test("an expired lease is stolen; an unexpired one is not") {
    val (fs, p, dir) = fsAndDir()
    try {
      var t = 1000L
      val now = () => t
      assert(Lease.acquire(fs, p, "crashed-holder", 500L, now))
      t = 1499L // one ms before expiry: still live
      assert(!Lease.acquire(fs, p, "stealer", 500L, now))
      t = 1501L // past expiry: dead state from a crashed holder
      assert(Lease.acquire(fs, p, "stealer", 500L, now),
        "expired lease not stolen")
      assert(Lease.read(fs, p).contains(("stealer", 2001L)))
      // the original holder has lost it and cannot renew
      assert(!Lease.renew(fs, p, "crashed-holder", 500L, now))
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(dir))
    }
  }

  test("withLease blocks until the holder frees, renews while running, releases after") {
    val (fs, p, dir) = fsAndDir()
    try {
      // real clock here: withLease's renewal daemon is time-driven
      assert(Lease.acquire(fs, p, "other", 600L))
      val t0 = System.nanoTime()
      // hold for ~1 s then release from a second thread
      new Thread(() => {
        Thread.sleep(1000)
        Lease.release(fs, p, "other")
      }).start()
      var sawOwn = false
      Lease.withLease(fs, p, "me", ttlMs = 600L, pollMs = 50L) {
        sawOwn = Lease.read(fs, p).exists(_._1 == "me")
        Thread.sleep(700) // > ttl/3: at least one renewal fires
        assert(Lease.read(fs, p).exists(_._1 == "me"),
          "lease lost mid-body despite renewal daemon")
      }
      assert(sawOwn, "body ran without holding the lease")
      assert((System.nanoTime() - t0) / 1e9 >= 0.9,
        "withLease did not wait for the live holder")
      assert(Lease.read(fs, p).isEmpty, "lease not released after body")
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(dir))
    }
  }

  test("a torn lease file (crash between create and write) is steal-able, not a lockout") {
    val (fs, p, dir) = fsAndDir()
    try {
      // an empty lease file: exists, so create-if-absent fails forever —
      // it must read as an expired corpse, never as 'absent'
      fs.create(p, true).close()
      assert(Lease.read(fs, p).contains(("", Long.MinValue)))
      assert(Lease.acquire(fs, p, "rescuer", 500L, () => 1000L),
        "torn lease locked every writer out")
      assert(Lease.read(fs, p).exists(_._1 == "rescuer"))
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(dir))
    }
  }

  test("a steal whose fresh lease is deleted by a racing stealer is NOT confirmed") {
    val (fs, p, dir) = fsAndDir()
    System.setProperty("graft.lease.steal.confirm.ms", "400")
    try {
      var t = 1000L
      val now = () => t
      assert(Lease.acquire(fs, p, "crashed", 100L, now))
      t = 2000L // expired
      // the racing stealer: saw the same expired corpse before our
      // delete; its delete lands DURING our confirm guard, killing our
      // fresh lease, and its create wins
      val rival = new Thread(() => {
        Thread.sleep(100)
        fs.delete(p, false)
        Lease.acquire(fs, p, "rival", 100000L, () => 2000L); ()
      })
      rival.start()
      val got = Lease.acquire(fs, p, "me", 100000L, now)
      rival.join(5000)
      assert(!got, "steal confirmed despite losing its lease in the guard window")
      assert(Lease.read(fs, p).exists(_._1 == "rival"))
    } finally {
      System.clearProperty("graft.lease.steal.confirm.ms")
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(dir))
    }
  }

  test("withLease fails LOUD when the lease is lost mid-body") {
    val (fs, p, dir) = fsAndDir()
    try {
      val e = intercept[java.io.IOException] {
        Lease.withLease(fs, p, "me", ttlMs = 150L, pollMs = 20L) {
          // simulate a thief overwriting the lease while the body runs
          Thread.sleep(60)
          val out = fs.create(p, true)
          out.write("thief\n999999999999999\n".getBytes("UTF-8")); out.close()
          Thread.sleep(300) // let the renewal daemon observe the loss
        }
      }
      assert(e.getMessage.contains("LOST"),
        s"lost lease must fail the maintenance op: ${e.getMessage}")
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(dir))
    }
  }

  test("release skips an EXPIRED lease of its own (steal-able garbage, not ours to delete)") {
    val (fs, p, dir) = fsAndDir()
    try {
      var t = 1000L
      val now = () => t
      assert(Lease.acquire(fs, p, "owner-a", 500L, now))
      t = 2000L // past expiry: a stealer could be mid-acquire right now —
      // deleting would race its fresh create (the ADVICE r19 window)
      Lease.release(fs, p, "owner-a", now)
      assert(Lease.read(fs, p).isDefined,
        "release deleted an expired lease — the stealer-race window is open")
      // an UNEXPIRED lease still releases normally
      t = 3000L
      assert(Lease.acquire(fs, p, "owner-a", 500L, now))
      Lease.release(fs, p, "owner-a", now)
      assert(Lease.read(fs, p).isEmpty)
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(dir))
    }
  }

  test("a lost lease rides a FAILING body as a suppressed exception") {
    val (fs, p, dir) = fsAndDir()
    try {
      val e = intercept[RuntimeException] {
        Lease.withLease(fs, p, "me", ttlMs = 150L, pollMs = 20L) {
          Thread.sleep(60)
          val out = fs.create(p, true)
          out.write("thief\n999999999999999\n".getBytes("UTF-8")); out.close()
          Thread.sleep(300) // let the renewal daemon observe the loss
          throw new RuntimeException("body failed on its own")
        }
      }
      assert(e.getMessage.contains("body failed"))
      assert(e.getSuppressed.exists(_.getMessage.contains("LOST")),
        "the concurrent-writer fact must ride the body's exception, " +
          s"not just a WARN log: suppressed=${e.getSuppressed.toSeq}")
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(dir))
    }
  }

  test("a transient renew blip is NOT reported as a lost lease") {
    val (fs, p, dir) = fsAndDir()
    try {
      // the daemon's renew fails once (we delete the file under it to
      // force renew()==false), but the re-read path re-stamps: the file
      // gone means genuine loss — so instead simulate the TRANSIENT
      // case directly: owner still matches on re-read, write succeeds.
      // Here: replace the lease content with OUR OWN owner but stale
      // expiry mid-body; renew succeeds against it, no loss recorded.
      val r = Lease.withLease(fs, p, "me", ttlMs = 150L, pollMs = 20L) {
        Thread.sleep(60)
        // overwrite with our own owner and an almost-expired stamp —
        // the daemon's renew sees owner==me and re-stamps (no loss)
        val out = fs.create(p, true)
        out.write(s"me\n${System.currentTimeMillis() + 1}\n".getBytes("UTF-8"))
        out.close()
        Thread.sleep(300)
        42
      }
      assert(r == 42, "withLease failed a body whose lease was never lost")
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(dir))
    }
  }

  test("withLease times out loudly when the holder never frees") {
    val (fs, p, dir) = fsAndDir()
    try {
      assert(Lease.acquire(fs, p, "immortal", 60000L))
      val e = intercept[java.io.IOException] {
        Lease.withLease(fs, p, "me", ttlMs = 60000L, pollMs = 20L,
          acquireTimeoutMs = 200L) { fail("body must not run") }
      }
      assert(e.getMessage.contains("immortal"),
        s"timeout must name the holder: ${e.getMessage}")
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(dir))
    }
  }

  test("maintenance wiring: TTL knob + force routes stageInsert through the lease") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-lease-maint").toString
    System.setProperty("graft.ivf.lease.ttl.ms", "60000")
    System.setProperty("graft.ivf.lease.force", "1")
    try {
      import spark.implicits._
      val rows = Seq((1L, 0, Seq(1.0f, 0.0f), 1.0, 0))
        .toDF("vec_id", "label", "embedding", "nrm", "cell")
      graft.queries.Vectors.stageInsert(spark, root, rows)
      assert(spark.read.parquet(s"$root/staging").count() == 1)
      // the lease engaged and was released; no flock file was taken
      assert(!new java.io.File(s"$root/.maintlease").exists,
        "lease file not released after maintenance")
      assert(!new java.io.File(s"$root/.maintlock").exists,
        "flock taken despite lease routing")
      // and a live foreign lease stalls maintenance until it frees
      val lp = new Path(root, ".maintlease")
      val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(Lease.acquire(fs, lp, "foreign", 1200L))
      val t0 = System.nanoTime()
      graft.queries.Vectors.stageInsert(spark, root, rows) // waits for expiry+steal
      assert((System.nanoTime() - t0) / 1e9 >= 0.9,
        "maintenance did not wait for the foreign lease")
      assert(spark.read.parquet(s"$root/staging").count() == 2)
    } finally {
      System.clearProperty("graft.ivf.lease.ttl.ms")
      System.clearProperty("graft.ivf.lease.force")
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(root))
    }
  }
}
