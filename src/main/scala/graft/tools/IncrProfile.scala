package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** t26 scale profile: the incremental-dedup index at corpus scale.
  *
  * The gate's banding is oracle-locked at 4 bands × 2 minhash rows (the
  * t6 shape DuckDB can recompute). At x1000 (5M docs) that depth is
  * known-wrong by the same physics the t18/v9 auto-depth gates measure:
  * 2-row band keys collide by chance across a 4.5M-doc corpus, so
  * index-bucket occupancy explodes and with it the corpus×shard
  * candidate pair count. This tool MEASURES that explosion (occupancy +
  * exact pre-distinct pair count per depth) and then times the shard
  * dedup end-to-end at the measured auto depth — the production build
  * parameter ([[graft.queries.Lsh.autoRowsPerBand]] semantics: depth
  * from occupancy, band count from the recall closed form, so deepening
  * costs no near-dup recall).
  *
  * Usage: runMain graft.tools.IncrProfile <dir> <depth...>
  *   depth = integer rows-per-band; bands = 4 for depth 2 (the
  *   oracle-locked pair) else Lsh.bandsForRecall(0.9, depth, 1-1e-6).
  *   Pair counts are always measured; the timed dedup runs only when
  *   the estimate is under 5M pairs (above that the measurement IS the
  *   finding — the x1000 depth-2 run measured 45.2M pre-distinct pairs
  *   and the scoring join spilled the disk out).
  */
object IncrProfile {

  def main(args: Array[String]): Unit = {
    val dir = args.head
    val depths = args.tail.map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sh = graft.queries.Text.shingles(spark, dir, 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[incr] shingle rows: ${sh.count()}")
    val docs = graft.Tables.documents(spark, dir)
    val corpusDocs = docs.filter(col("doc_id") % 10 =!= 7)
    val deltaDocs = docs.filter(col("doc_id") % 10 === 7)

    // the per-row closed form at the probed banding (rowLshKeysAt — same
    // salts/band layout as lshBuckets, proven row-identical at 4x2 by
    // TextIncrementalIndexSpec): the aggregate form's min(md5str)
    // SortAggregate per-partition-sorts the exploded shingles and died
    // at x1000 depth 3 before printing anything
    def sig(base: DataFrame, bands: Int, depth: Int): DataFrame =
      graft.queries.Text.rowLshKeysAt(base, bands, depth)

    depths.foreach { depth =>
      val bands =
        if (depth == 2) 4
        else graft.queries.Lsh.bandsForRecall(0.9, depth, 1.0 - 1e-6)
      val t0 = System.nanoTime()
      val cap = graft.queries.Lsh.DefaultBucketCap
      val c = sig(corpusDocs, bands, depth).groupBy("bk").agg(count(lit(1)).as("nc"))
        .persist()
      val d = sig(deltaDocs, bands, depth).groupBy("bk").agg(count(lit(1)).as("nd"))
      // dropped index rows aggregate over ALL corpus buckets — a left
      // join would hide nothing, but an inner join with the delta would
      // exclude over-cap buckets the delta happens not to probe
      val dr = c.agg(sum(greatest(col("nc") - cap, lit(0))).as("dropped"),
        max("nc").as("max_bucket")).head()
      val j = c.join(d, "bk")
        .agg(sum(col("nc") * col("nd")).as("pairs"),
          // the bounded probe fan-out the build-time cap leaves
          sum(least(col("nc"), lit(cap)) * col("nd")).as("capped_pairs"))
        .head()
      c.unpersist()
      val pairs = Option(j.get(0)).map(_.toString.toLong).getOrElse(0L)
      val maxB = Option(dr.get(1)).map(_.toString.toLong).getOrElse(0L)
      val dropped = Option(dr.get(0)).map(_.toString.toLong).getOrElse(0L)
      val cappedPairs = Option(j.get(1)).map(_.toString.toLong).getOrElse(0L)
      val measureSec = (System.nanoTime() - t0) / 1e9
      println(f"[incr] depth=$depth bands=$bands pre-distinct pairs=$pairs%,d " +
        f"max corpus bucket=$maxB%,d (measure ${measureSec}%.1f s); " +
        f"cap=$cap: dropped index rows=$dropped%,d, capped pairs=$cappedPairs%,d")
      if (pairs < 5_000_000L) {
        // end-to-end at this depth: persisted bucketed index build, then
        // the timed shard dedup (bucket join → distinct pairs → exact
        // jaccard) — the gate's exact plan shape at a scale-correct
        // depth, including the shipped occupancy-capped build
        // (cappedIndexFrame + writePrepared, one shuffle total)
        val corpus = sig(corpusDocs, bands, depth)
        val buckets = math.max(8L, (pairs.max(1L) / 500000L).max(
          corpus.count() / 500000L)).toInt
        val name = s"graft_incrprof_d$depth"
        val path = s"${System.getProperty("java.io.tmpdir")}/$name"
        spark.sql(s"DROP TABLE IF EXISTS `$name`")
        val tb = System.nanoTime()
        graft.sources.Bucketed.writePrepared(
          graft.queries.Text.cappedIndexFrame(corpus, buckets),
          name, path, buckets, Seq("bk"), Seq("bk", "doc_id"))
        val buildSec = (System.nanoTime() - tb) / 1e9
        val tq = System.nanoTime()
        val shard = sig(deltaDocs, bands, depth)
          .withColumnRenamed("doc_id", "doc2")
          .repartition(buckets, col("bk"))
        val cand = graft.sources.Bucketed.table(spark, name)
          .withColumnRenamed("doc_id", "doc1").hint("merge")
          .join(shard.hint("merge"), "bk")
          .select("doc1", "doc2").distinct()
        val n = sh.groupBy("doc_id").agg(count(lit(1)).as("ns"))
        val a = sh.select(col("doc_id").as("doc1"), col("shingle"))
        val b = sh.select(col("doc_id").as("doc2"), col("shingle"))
        val scored = cand.join(a, "doc1").join(b, Seq("doc2", "shingle"))
          .groupBy("doc1", "doc2").agg(count(lit(1)).as("ic"))
          .join(n.select(col("doc_id").as("doc1"), col("ns").as("na")), "doc1")
          .join(n.select(col("doc_id").as("doc2"), col("ns").as("nb")), "doc2")
          .select((col("ic").cast("double") / (col("na") + col("nb") - col("ic")))
            .as("jaccard"))
        val nearDups = scored.filter(col("jaccard") >= 0.8).count()
        val dedupSec = (System.nanoTime() - tq) / 1e9
        println(f"[incr] depth=$depth buckets=$buckets index build ${buildSec}%.1f s; " +
          f"shard dedup ${dedupSec}%.1f s; neardup pairs (j>=0.8) $nearDups%,d")
        // maintenance half: the shard capped against the live index, with
        // the loss + exactness sentinels (dropped/undercut) in the report
        // — a capped or out-of-order insert must show up in the numbers,
        // not just in a warn line
        val tm = System.nanoTime()
        val dObs = org.apache.spark.sql.Observation(s"incrprof_delta_d$depth")
        val accepted = graft.queries.Text.cappedDelta(
          graft.sources.Bucketed.table(spark, name),
          sig(deltaDocs, bands, depth), buckets, obs = Some(dObs)).count()
        val maintSec = (System.nanoTime() - tm) / 1e9
        val dm = dObs.get
        println(f"[incr] depth=$depth delta maintenance ${maintSec}%.1f s: " +
          f"accepted=$accepted%,d dropped=${dm("dropped_ids")} " +
          f"undercut=${dm("undercut_ids")}")
        spark.sql(s"DROP TABLE IF EXISTS `$name`")
        graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(path))
      } else {
        println(s"[incr] depth=$depth SKIPPED timed dedup: " +
          s"$pairs pre-distinct pairs is the finding (spill-bound at this box)")
      }
    }
    sh.unpersist()
    spark.stop()
  }
}
