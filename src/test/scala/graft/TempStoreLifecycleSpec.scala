package graft

import graft.queries.{Relational, Text, Vectors}
import java.io.File

/** The session temp-store lifecycle, end to end: every gate that persists
  * derived state under java.io.tmpdir (t25 jsonl fixture, t26 signature
  * index, j10 bucketed tables, v7/v13 IVF indexes) must leave tmp FLAT
  * across clear/rebuild cycles — a long-lived session that processes many
  * corpora must not grow the disk by one store copy per pass. r13 only
  * exercised j10's reap path; this pins all five families at once.
  */
class TempStoreLifecycleSpec extends SparkSuite {

  private val Reaped =
    Seq("graft_t26_idx_", "graft-bucketed-", "graft-ivf-index", "graft-ivf-incr")
  // the jsonl fixture is stable per (JVM, dir) and overwritten in place;
  // it is reaped by the JVM shutdown hook, not by clearCaches
  private val Stable = Seq("graft-jsonl-")

  private def snap(): Map[String, Int] = {
    val tmp = new File(System.getProperty("java.io.tmpdir"))
    (Reaped ++ Stable).map { p =>
      p -> tmp.listFiles().count(_.getName.startsWith(p))
    }.toMap
  }

  private def runGates(): Unit =
    Seq("t25_jsonl_ingest", "t26_incremental_dedup", "j10_bucketed_colocated",
        "v7_ivf_persisted", "v13_ivf_incremental").foreach { q =>
      assert(SparkEntry.queries(q)(spark, sf0001).count() > 0, s"$q returned no rows")
    }

  private def clearAll(): Unit = {
    Text.clearCaches(spark)
    Vectors.clearIndexCache(spark)
    Relational.clearBucketedCache(spark)
  }

  test("two clear/rebuild cycles leave every temp store flat") {
    runGates(); clearAll()
    val after1 = snap()
    // rebuild: each reaped family materializes exactly one fresh store
    // (new random token / temp dir per build), the jsonl fixture reuses
    // its stable path
    runGates()
    val mid = snap()
    Reaped.foreach { p =>
      assert(mid(p) == after1(p) + 1,
        s"$p: expected one fresh store during rebuild, ${after1(p)} -> ${mid(p)}")
    }
    Stable.foreach { p =>
      assert(mid(p) == after1(p), s"$p: stable store count moved ${after1(p)} -> ${mid(p)}")
    }
    clearAll()
    val after2 = snap()
    assert(after2 == after1,
      s"temp stores grew across a clear/rebuild cycle: $after1 -> $after2")
  }
}
