package graft.queries

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** v13 incremental IVF maintenance: the hash-exact oracle proves the
  * search result; this spec pins the MAINTENANCE invariants the oracle
  * can't see — the on-disk layout after insert+compaction (one file per
  * cell), membership conservation (no vector lost or doubled by the
  * append/compact cycle), and that search-after-insert equals
  * search-over-a-rebuilt index computed inline with the same membership.
  */
class IvfIncrementalSpec extends SparkSuite {

  test("gate layout: flushed cells hold appended files under the compaction threshold; staging holds the unflushed tail") {
    val idx = Vectors.ivfIncrementalIndex(spark, sf0001)
    val root = new java.io.File(s"$idx/vectors")
    val cells = root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cells.nonEmpty, s"no cell dirs under $root")
    // the flushed half appended files but stayed under CompactFileThreshold
    // — so SOME cells must hold >1 file (search straddles original +
    // appended generations) and none was rewritten by compaction
    val counts = cells.map(_.listFiles().count(_.getName.endsWith(".parquet")))
    assert(counts.exists(_ > 1),
      "no cell holds an appended file — the flush path didn't run")
    assert(counts.forall(_ <= Vectors.CompactFileThreshold))
    // the second delta half is still staged, delta-sized
    val staged = Vectors.stagedRows(spark, idx)
    assert(staged.nonEmpty, "no staging table — the unflushed tail is missing")
    assert(staged.get.count() > 0)
  }

  test("insert conserves membership: index ∪ staging rows = corpus rows, ids identical") {
    val idx = Vectors.ivfIncrementalIndex(spark, sf0001)
    val stored = spark.read.parquet(s"$idx/vectors").select("vec_id")
      .unionByName(Vectors.stagedRows(spark, idx).get.select("vec_id"))
    val corpus = Tables.embeddings(spark, sf0001).select("vec_id")
    assert(stored.count() == corpus.count(), "row count drifted through stage/flush")
    assert(stored.exceptAll(corpus).isEmpty && corpus.exceptAll(stored).isEmpty,
      "vec_id multiset drifted through stage/flush")
  }

  test("forced compaction (maxFiles=1) across the append boundary preserves search") {
    val before = graft.SparkEntry.queries("v13_ivf_incremental")(spark, sf0001)
      .collect().map(_.toString).toSet
    val idx = Vectors.ivfIncrementalIndex(spark, sf0001)
    val n = Vectors.compactCells(spark, s"$idx/vectors", maxFiles = 1)
    assert(n > 0, "forced compaction rewrote no cells — nothing straddled")
    val root = new java.io.File(s"$idx/vectors")
    val multi = root.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .filter(_.listFiles().count(_.getName.endsWith(".parquet")) != 1)
    assert(multi.isEmpty,
      s"cells not compacted to one file: ${multi.map(_.getName).mkString(", ")}")
    val after = graft.SparkEntry.queries("v13_ivf_incremental")(spark, sf0001)
      .collect().map(_.toString).toSet
    assert(after === before,
      "search result changed across the compaction boundary")
  }

  test("search over the maintained index equals search over rebuilt membership") {
    graft.functions.GraftFunctions.register(spark)
    val maintained = graft.SparkEntry.queries("v13_ivf_incremental")(spark, sf0001)
    // rebuilt: same membership computed inline, no files — base vectors in
    // their label cell, delta routed against the same frozen base centroids
    val idx = Vectors.ivfIncrementalIndex(spark, sf0001)
    val cent = spark.read.parquet(s"$idx/centroids")
    val emb = Tables.embeddings(spark, sf0001)
    val e = emb.withColumn("nrm", expr("sqrt(array_dot(embedding, embedding))"))
    val baseMem = e.filter(col("vec_id") % 20 =!= 3)
      .select(col("vec_id"), col("label").as("cell"), col("embedding"), col("nrm"))
    val delta = e.filter(col("vec_id") % 20 === 3)
    val routedMem = Vectors.routeQueries(
        delta.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
        cent, cent.count())
      .select(col("q_id").as("vec_id"), col("cell"))
      .join(delta.select("vec_id", "embedding", "nrm"), "vec_id")
      .select("vec_id", "cell", "embedding", "nrm")
    val mem = baseMem.unionByName(routedMem)
    val q = e.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val qcell = Vectors.routeQueries(q.select("q_id", "q_emb"), cent, cent.count())
      .join(q, "q_id")
    val scored = mem.join(broadcast(qcell), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        expr("array_dot(embedding, q_emb)") / (col("nrm") * col("q_nrm")))
      .groupBy("q_id")
      .agg(expr("topk_by(-cos, vec_id, 3)").as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), col("t.id").as("vec_id"),
        (col("pos") + 1).cast("int").as("rk"), (-col("t.score")).as("cos"))
    val a = maintained.collect()
      .map(r => (r.get(0).toString, r.get(1).toString, r.get(2).toString)).toSet
    val b = scored.collect()
      .map(r => (r.get(0).toString, r.get(1).toString, r.get(2).toString)).toSet
    assert(a == b, s"maintained vs rebuilt diverge: ${(a diff b) ++ (b diff a)}")
  }
}
