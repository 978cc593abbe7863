package graft.queries

import graft.SparkSuite
import graft.sources.Bucketed
import org.apache.spark.sql.functions._

/** Deletions for the maintained TEXT indexes (VERDICT r19 next #2): the
  * generic bucketed-store tombstone tier (stage → serving mask → vacuum
  * → retire) and its liveness — every assertion here is proven
  * NON-vacuous (the thing masked/removed is first shown present).
  */
class TextTombstoneSpec extends SparkSuite {

  private def freshStore(rows: Seq[(String, Long)]): (String, String) = {
    import spark.implicits._
    val tok = java.lang.Long.toHexString(
      java.util.concurrent.ThreadLocalRandom.current().nextLong())
    val name = s"graft_ttomb_$tok"
    val path = s"${System.getProperty("java.io.tmpdir")}/$name"
    Bucketed.write(rows.toDF("h", "doc_id"), name, path, 4, Seq("h"),
      Seq("h", "doc_id"))
    (name, path)
  }

  private def cleanup(name: String, path: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    spark.sql(s"DROP TABLE IF EXISTS `${name}__compact`")
    graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(path))
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("stage masks from serving; vacuum physically removes and retires") {
    import spark.implicits._
    val (name, path) = freshStore(
      (1L to 20L).map(i => (s"h$i", i)))
    try {
      // present before (non-vacuous)
      assert(ids(Bucketed.table(spark, name)).contains(7L))
      Bucketed.stageDelete(spark, name,
        Seq(7L, 13L).toDF("doc_id"), "doc_id")
      // masked from serving while still physically on disk
      val masked = Bucketed.minusTombstones(
        spark, name, Bucketed.table(spark, name), "doc_id")
      assert(ids(masked) == ((1L to 20L).toSet -- Set(7L, 13L)))
      assert(ids(Bucketed.table(spark, name)).contains(7L),
        "stageDelete must not touch data files")
      // the mask adds NO shuffle exchange (broadcast anti only)
      assert(!Bucketed.hasShuffle(masked),
        s"tombstone mask shuffled:\n${masked.queryExecution.executedPlan}")
      // vacuum: physically gone, tombstones retired, mask now a no-op
      assert(Bucketed.vacuumTombstones(spark, name, "doc_id") == 2L)
      assert(ids(Bucketed.table(spark, name)) ==
        ((1L to 20L).toSet -- Set(7L, 13L)))
      assert(Bucketed.tombstones(spark, name).isEmpty,
        "vacuum must retire the applied tombstone files")
      assert(Bucketed.bucketFileCounts(spark, name).values.forall(_ == 1),
        "vacuum's surgical rewrite fragmented the store")
      // idempotent re-vacuum
      assert(Bucketed.vacuumTombstones(spark, name, "doc_id") == 0L)
    } finally cleanup(name, path)
  }

  test("post-rewrite pre-retire crash: stale tombstones are harmless and retire on re-vacuum") {
    import spark.implicits._
    val (name, path) = freshStore((1L to 10L).map(i => (s"h$i", i)))
    try {
      Bucketed.stageDelete(spark, name, Seq(3L).toDF("doc_id"), "doc_id")
      assert(Bucketed.vacuumTombstones(spark, name, "doc_id") == 1L)
      // simulate the crash window: the rewrite committed but the retire
      // never ran — re-stage the SAME id (its rows are already gone)
      Bucketed.stageDelete(spark, name, Seq(3L).toDF("doc_id"), "doc_id")
      val masked = Bucketed.minusTombstones(
        spark, name, Bucketed.table(spark, name), "doc_id")
      assert(ids(masked) == ((1L to 10L).toSet - 3L),
        "stale tombstone changed serving")
      // re-vacuum: nothing to rewrite, but the stale files retire
      assert(Bucketed.vacuumTombstones(spark, name, "doc_id") == 1L)
      assert(Bucketed.tombstones(spark, name).isEmpty)
      assert(ids(Bucketed.table(spark, name)) == ((1L to 10L).toSet - 3L))
    } finally cleanup(name, path)
  }

  test("exact-hash multiplicity: the veto lapses only with the LAST carrier") {
    import spark.implicits._
    // two carriers of hash hX, one of hY
    val (name, path) = freshStore(
      Seq(("hX", 1L), ("hX", 2L), ("hY", 3L)))
    try {
      def liveHashes(): Set[String] =
        Bucketed.minusTombstones(
            spark, name, Bucketed.table(spark, name), "doc_id")
          .select("h").distinct().collect().map(_.getString(0)).toSet
      assert(liveHashes() == Set("hX", "hY"))
      // delete ONE carrier of hX: the hash must keep vetoing
      Bucketed.stageDelete(spark, name, Seq(1L).toDF("doc_id"), "doc_id")
      assert(liveHashes() == Set("hX", "hY"),
        "deleting one carrier must not lift the exact-dedup veto")
      Bucketed.vacuumTombstones(spark, name, "doc_id")
      assert(liveHashes() == Set("hX", "hY"))
      // delete the LAST carrier: now the veto lapses
      Bucketed.stageDelete(spark, name, Seq(2L).toDF("doc_id"), "doc_id")
      assert(liveHashes() == Set("hY"),
        "deleting the last carrier must lift the veto")
    } finally cleanup(name, path)
  }

  test("gate-scale takedown: deleted-but-unvacuumed docs absent from serving, wave 1 physically gone") {
    val s = spark
    val ((idx, _), (eidx, _), idxName, exhName) =
      Text.deletedIndexesForTesting(s, sf0001)
    val corpus = graft.Tables.documents(s, sf0001)
      .filter(col("doc_id") % 10 =!= 7)
    val wave1 = ids(corpus.filter(col("doc_id") % 14 === 2).select("doc_id"))
    val wave2 = ids(corpus.filter(col("doc_id") % 14 === 9).select("doc_id"))
    assert(wave1.nonEmpty && wave2.nonEmpty, "takedown fixture vacuous")
    // wave 1 was vacuumed: physically absent from the raw tables
    assert(ids(Bucketed.table(s, idxName)).intersect(wave1).isEmpty,
      "vacuumed ids survive in the signature index files")
    assert(ids(Bucketed.table(s, exhName)).intersect(wave1).isEmpty,
      "vacuumed ids survive in the exact-hash index files")
    // wave 2 is deleted-but-UNVACUUMED: still in the files (that is the
    // non-vacuousness of the mask) yet absent from serving
    assert(ids(Bucketed.table(s, idxName)).intersect(wave2).nonEmpty,
      "wave 2 should still be on disk (tombstoned, not vacuumed)")
    assert(ids(idx).intersect(wave2).isEmpty,
      "deleted-but-unvacuumed ids served from the signature index")
    assert(ids(eidx).intersect(wave2).isEmpty,
      "deleted-but-unvacuumed ids served from the exact-hash index")
  }

  test("deletion effects are LIVE in the gates: revived replay + silenced candidate source") {
    val s = spark
    val del = Set(2L, 9L)
    // s18 vs s10: the takedown must REVIVE at least one replay (a
    // re-crawl of a deleted doc's text passes the anti-join now), and
    // every revived id must be a replay of a deleted corpus doc
    val s10 = ids(graft.SparkEntry.queries("s10_stream_admission")(s, sf0001))
    val s18 = ids(graft.SparkEntry.queries("s18_stream_admission_deleted")(s, sf0001))
    val revived = s18 -- s10
    assert(revived.nonEmpty, "takedown revived no replay — vacuous gate")
    assert(s10.subsetOf(s18), "takedown must only ADD survivors")
    revived.foreach { id =>
      assert(id >= 1000000000L && del.contains((id - 1000000000L) % 14),
        s"revived id $id is not a replay of a deleted corpus doc")
    }
    // t29 vs t26: deleted docs stop appearing as candidate sources
    def doc1s(q: String) = graft.SparkEntry.queries(q)(s, sf0001)
      .select("doc1").collect().map(_.getLong(0)).toSet
    val t26d1 = doc1s("t26_incremental_dedup")
    val t29d1 = doc1s("t29_incremental_dedup_deleted")
    assert(t26d1.exists(id => del.contains(id % 14)),
      "no deleted doc was a t26 candidate source — vacuous")
    assert(!t29d1.exists(id => del.contains(id % 14)),
      "deleted doc still a candidate source after the takedown")
    assert(t29d1.subsetOf(t26d1))
  }
}
