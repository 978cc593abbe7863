package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Price the deletion tier on BOTH maintained index families (VERDICT
  * r19 next #1/#2's cost rows): a 1% takedown batch against the vector
  * index root (stageDelete → serving-mask overhead → vacuum, raw +
  * residual twins in lockstep) and against a t26-style bucketed
  * signature store (stageDelete → masked probe join → vacuum). The
  * target decade is stageInsert's delta pricing (r19: 1.7 s per 1%
  * delta at x1000) — a takedown should cost like an insert, not like
  * a rebuild.
  *
  * Usage: runMain graft.tools.DeleteProfile <sfDir>
  */
object DeleteProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // ---- vector family: the persisted index root with the residual
    // tier materialized (the production serving shape — vacuum rewrites
    // the raw cell files AND their residual code twins) ----
    val nVec = graft.Tables.embeddings(spark, dir).count()
    val t0 = System.nanoTime()
    val root = graft.queries.Vectors.ivfIndexForTesting(spark, dir)
    graft.queries.Vectors.residualPqForTesting(spark, dir)
    println(f"[delete] index+residual build/open: " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s ($nVec%,d vectors)")
    val delIds = graft.Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 100 === 7).select("vec_id")
    val nDel = delIds.count()
    val stageSec = timed(
      graft.queries.Vectors.stageDelete(spark, root, delIds))
    // serving-mask overhead: the raw serving scan with vs without the
    // tombstone anti-join (count() drives the full scan)
    val servedRaw = spark.read.parquet(s"$root/vectors")
    val maskedSec = timed {
      graft.queries.Vectors
        .minusTombstones(spark, root, servedRaw).count(); ()
    }
    val unmaskedSec = timed { servedRaw.count(); () }
    val vacuumSec = timed {
      val n = graft.queries.Vectors.vacuumTombstones(spark, root)
      require(n == nDel, s"vacuum retired $n of $nDel")
    }
    println(f"[delete] VECTORS: batch=$nDel%,d (1%%) stage=$stageSec%.2f s " +
      f"maskScan=$maskedSec%.2f s (unmasked $unmaskedSec%.2f) " +
      f"vacuum=$vacuumSec%.1f s")

    // ---- text family: a t26-recipe signature store over documents ----
    val docs = graft.Tables.documents(spark, dir)
    val buckets = graft.queries.Text.indexBucketsForTesting(docs.count())
    val sigs = graft.queries.Text.rowLshKeys(docs)
    val tok = java.lang.Long.toHexString(
      java.util.concurrent.ThreadLocalRandom.current().nextLong())
    val name = s"graft_delprof_$tok"
    val path = s"${System.getProperty("java.io.tmpdir")}/$name"
    graft.engine.TempReaper.register(path)
    val buildSec = timed(graft.sources.Bucketed.write(
      sigs, name, path, buckets, Seq("bk"), Seq("bk", "doc_id")))
    val docDel = docs.filter(col("doc_id") % 100 === 7).select("doc_id")
    val nDocDel = docDel.count()
    val tStageSec = timed(
      graft.sources.Bucketed.stageDelete(spark, name, docDel, "doc_id"))
    val probe = sigs.withColumnRenamed("doc_id", "doc2")
      .repartition(buckets, col("bk")).persist()
    probe.count()
    def probeJoin(masked: Boolean): Double = timed {
      val idx0 = graft.sources.Bucketed.table(spark, name)
      val idx = if (masked)
        graft.sources.Bucketed.minusTombstones(spark, name, idx0, "doc_id")
      else idx0
      idx.hint("merge").join(probe.hint("merge"), "bk").count(); ()
    }
    val joinMasked = probeJoin(masked = true)
    val joinPlain = probeJoin(masked = false)
    val tVacuumSec = timed {
      val n = graft.sources.Bucketed.vacuumTombstones(spark, name, "doc_id")
      require(n == nDocDel, s"text vacuum retired $n of $nDocDel")
    }
    println(f"[delete] TEXT: store build=$buildSec%.1f s " +
      f"(${sigs.count()}%,d sig rows, $buckets buckets); batch=$nDocDel%,d " +
      f"(1%%) stage=$tStageSec%.2f s probeJoin masked=$joinMasked%.2f s " +
      f"plain=$joinPlain%.2f s vacuum=$tVacuumSec%.1f s")
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    spark.stop()
  }
}
