package graft.queries

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** The tombstone tier's MAINTENANCE invariants (VERDICT r19 next #1) —
  * the v18/v19/s16/s17 oracles prove the search results; this spec pins
  * what they can't see: immediate masking across all three storage
  * states, the flush dropping tombstoned staged rows in raw/residual
  * lockstep, vacuum physically removing dead rows and retiring exactly
  * the applied tombstones, full-cell retirement, and the crash windows
  * (a stranded rewrite aside; a vacuum re-run after a crash before the
  * retire) converging instead of losing live rows.
  */
class TombstoneMaintenanceSpec extends SparkSuite {

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-tomb-$tag").toString

  private def ids(root: String, sub: String): Set[Long] = {
    val p = new java.io.File(s"$root/$sub")
    if (!p.exists ||
        !p.listFiles().exists(f =>
          f.getName.endsWith(".parquet") || f.getName.startsWith("cell=")))
      Set.empty
    else spark.read.parquet(p.toString)
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
  }

  test("stageDelete masks immediately across all three storage states; flush never resurrects") {
    val out = freshRoot("mask")
    try {
      Vectors.buildMaintainedIndexForTesting(spark, sf0001, out)
      val indexed = ids(out, "vectors")
      val staged = ids(out, "staging")
      // one victim per storage state: an original base row, a flushed
      // delta row (%40==3, in cell files but not base), a staged row
      val base = (indexed -- staged).filter(_ % 20 != 3).head
      val flushed = indexed.filter(_ % 40 == 3).head
      val stagedOnly = (staged -- indexed).head
      val victims = Set(base, flushed, stagedOnly)
      import spark.implicits._
      Vectors.stageDelete(spark, out, victims.toSeq.toDF("vec_id"))
      def serving(): Set[Long] = {
        val all = spark.read.parquet(s"$out/vectors")
          .unionByName(Vectors.stagedRows(spark, out).get)
        Vectors.minusTombstones(spark, out, all)
          .select("vec_id").collect().map(_.getLong(0)).toSet
      }
      val total = indexed ++ staged
      assert(serving() === total -- victims,
        "tombstoned ids not masked immediately (or a live id went missing)")
      // flushing the remaining staged rows must DROP the tombstoned one,
      // not write it into a cell file
      Vectors.flushStaging(spark, out, blockBytes = 1L)
      assert(!ids(out, "vectors").contains(stagedOnly),
        "a tombstoned staged row was flushed into a cell file")
      assert(ids(out, "staging").isEmpty || !ids(out, "staging").contains(stagedOnly))
      // the tombstones survive the flush (the INDEX side still holds two)
      assert(Vectors.tombstoneIds(spark, out).isDefined,
        "flush retired tombstones it did not fully apply")
      val afterFlush = Vectors.minusTombstones(
        spark, out, spark.read.parquet(s"$out/vectors"))
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(afterFlush === total -- victims)
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(out))
    }
  }

  test("flush drops a tombstoned staged row's RESIDUAL code in lockstep — no phantom codes") {
    val out = freshRoot("resid")
    try {
      Vectors.buildResidualLivingRootForTesting(spark, sf0001, out)
      val stagedOnly = (ids(out, "staging") -- ids(out, "vectors")).head
      import spark.implicits._
      Vectors.stageDelete(spark, out, Seq(stagedOnly).toDF("vec_id"))
      Vectors.flushStaging(spark, out, blockBytes = 1L)
      assert(!ids(out, "vectors").contains(stagedOnly))
      assert(!ids(out, "residual/codes").contains(stagedOnly),
        "the raw row was dropped but its residual code flushed anyway — " +
          "a phantom code served forever against a vector that doesn't exist")
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(out))
    }
  }

  test("vacuum physically drops dead rows (raw + residual), retires tombstones, and is idempotent") {
    val out = freshRoot("vac")
    try {
      Vectors.buildResidualLivingRootForTesting(spark, sf0001, out)
      val before = ids(out, "vectors") ++ ids(out, "staging")
      val victims = before.filter(_ % 15 == 1)
      assert(victims.nonEmpty)
      import spark.implicits._
      Vectors.stageDelete(spark, out, victims.toSeq.toDF("vec_id"))
      val n = Vectors.vacuumTombstones(spark, out)
      assert(n == victims.size, s"vacuum retired $n of ${victims.size}")
      // physically gone from every tier — no anti-join needed to hide them
      assert(ids(out, "vectors").intersect(victims).isEmpty, "raw cell files still hold dead rows")
      assert(ids(out, "staging").intersect(victims).isEmpty, "staging still holds dead rows")
      assert(ids(out, "residual/codes").intersect(victims).isEmpty, "residual codes still hold dead rows")
      assert(ids(out, "residual/staging").intersect(victims).isEmpty)
      // live rows all survived
      assert(ids(out, "vectors") ++ ids(out, "staging") === before -- victims,
        "vacuum lost or duplicated a LIVE row")
      // tombstones retired; a second vacuum is a no-op
      assert(Vectors.tombstoneIds(spark, out).isEmpty, "applied tombstones not retired")
      assert(Vectors.vacuumTombstones(spark, out) == 0L)
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(out))
    }
  }

  test("a cell whose every row is tombstoned is retired whole") {
    val out = freshRoot("cellgone")
    try {
      Vectors.buildMaintainedIndexForTesting(spark, sf0001, out)
      val byCell = spark.read.parquet(s"$out/vectors")
        .groupBy("cell").agg(collect_set("vec_id").as("ids"))
        .collect().map(r => (r.get(0).toString, r.getSeq[Long](1).toSet))
      val (cell, cellIds) = byCell.minBy(_._2.size)
      import spark.implicits._
      Vectors.stageDelete(spark, out, cellIds.toSeq.toDF("vec_id"))
      Vectors.vacuumTombstones(spark, out)
      assert(!new java.io.File(s"$out/vectors/cell=$cell").exists,
        "fully-dead cell dir not retired")
      val survivors = ids(out, "vectors")
      assert(survivors.intersect(cellIds).isEmpty)
      assert(byCell.filter(_._1 != cell).forall(c => c._2.subsetOf(survivors)),
        "retiring one cell lost rows of another")
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(out))
    }
  }

  test("crash windows: a stranded rewrite aside is recovered; a crash before the retire converges on re-run") {
    val out = freshRoot("crash")
    try {
      Vectors.buildMaintainedIndexForTesting(spark, sf0001, out)
      val before = ids(out, "vectors") ++ ids(out, "staging")
      val victims = before.filter(_ % 15 == 2)
      assert(victims.nonEmpty)
      import spark.implicits._
      Vectors.stageDelete(spark, out, victims.toSeq.toDF("vec_id"))
      // window 1: a prior rewrite crashed between rename-aside and
      // rename-in — the live dir is GONE, only the aside holds the data
      val vecRoot = new java.io.File(s"$out/vectors")
      val someCell = vecRoot.listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell=")).head
      val aside = new java.io.File(vecRoot, "_old_" + someCell.getName)
      assert(someCell.renameTo(aside), "test setup: aside rename failed")
      val n = Vectors.vacuumTombstones(spark, out) // entry recovery restores it
      assert(n == victims.size)
      assert(ids(out, "vectors").intersect(victims).isEmpty)
      assert(ids(out, "vectors") ++ ids(out, "staging") === before -- victims,
        "recovery lost the stranded cell's live rows")
      // window 2: a crash AFTER the physical rewrites but BEFORE the
      // retire leaves applied tombstones behind — re-running converges
      // (re-applying is a no-op) and still retires them
      Vectors.stageDelete(spark, out, victims.toSeq.toDF("vec_id"))
      assert(Vectors.vacuumTombstones(spark, out) == victims.size,
        "re-applied tombstones (already physically absent) did not retire")
      assert(Vectors.tombstoneIds(spark, out).isEmpty)
      assert(ids(out, "vectors") ++ ids(out, "staging") === before -- victims)
    } finally {
      graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(out))
    }
  }

  test("gate root carries BOTH deletion states: retired wave physically gone, live wave masked only by the anti-join") {
    val idx = Vectors.ivfTombstoneIndex(spark, sf0001)
    val stored = ids(idx, "vectors") ++ ids(idx, "staging")
    // wave 1 (%14==2): vacuumed — physically absent
    assert(stored.forall(_ % 14 != 2), "vacuumed wave still physically present")
    // wave 2 (%14==9): live tombstones — physically PRESENT, so the
    // serving anti-join is what the gate proves (not a vacuum rerun)
    val liveTomb = stored.filter(_ % 14 == 9)
    assert(liveTomb.nonEmpty,
      "no live-tombstoned id is physically stored — the serving anti-join " +
        "is vacuous and the gate would pass with it dead")
    val t = Vectors.tombstoneIds(spark, idx)
    assert(t.isDefined)
    val tset = t.get.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(liveTomb.subsetOf(tset))
    // and the live tombstones span MORE than one storage state
    val staged = ids(idx, "staging")
    assert(staged.exists(_ % 14 == 9),
      "no staged row is live-tombstoned — the staging-side mask is untested")
    assert(ids(idx, "vectors").exists(_ % 14 == 9),
      "no cell-file row is live-tombstoned — the index-side mask is untested")
  }
}
