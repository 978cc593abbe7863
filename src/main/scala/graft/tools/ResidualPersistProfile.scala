package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale pricing of the PERSISTED residual tier (VERDICT r18 next #1's
  * BASELINE rows): on a GenScale corpus, time (a) the raw IVF index
  * build, (b) the one-time residual-tier build (train + on-disk
  * artifacts), (c) a serving RESTART — session memo dropped, tier
  * re-opened from disk (the cost the persistence exists to make
  * load-shaped instead of train-shaped), (d) a warm cell-pruned
  * residual ADC probe over 512 queries, and (e) staged-insert residual
  * encoding for a 1% delta (the FAISS add() path).
  *
  * Usage: runMain graft.tools.ResidualPersistProfile <sfDir>
  * Curve measurement is a separate knob (GRAFT_IVF_E2E_CURVE) priced by
  * its own rows — disable it for these numbers to isolate the tier.
  */
object ResidualPersistProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Vectors

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (root, tIdx) = time(Vectors.ivfIndexForTesting(spark, dir))
    println(f"[resid_persist] raw index build: $tIdx%.1f s ($root)")
    val t0 = Vectors.residualTrains.get()
    val ((_, nCells, codes, _, cbRows), tTier) =
      time(Vectors.residualPqOpen(spark, root))
    println(f"[resid_persist] tier build+open (cold): $tTier%.1f s " +
      f"(cells=$nCells codes=${codes.count()} trains=${Vectors.residualTrains.get() - t0})")
    // serving restart: memo gone, artifacts on disk
    Vectors.invalidateResidualSession(spark, root)
    val t1 = Vectors.residualTrains.get()
    val ((_, _, codes2, _, _), tOpen) = time {
      val st = Vectors.residualPqOpen(spark, root)
      st._3.count() // materialize the reloaded code table
      st
    }
    require(Vectors.residualTrains.get() == t1, "reopen retrained!")
    println(f"[resid_persist] reopen after restart (load, 0 trains): $tOpen%.1f s")
    // warm probe: 512 queries, cell-pruned residual ADC, bounded top-3
    val cent = spark.read.parquet(s"$root/residual/centroids")
    val cents = cent.orderBy("cell").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
    val q = graft.Tables.embeddings(spark, dir)
      .orderBy(xxhash64(col("vec_id"))).limit(512)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .persist()
    q.count()
    def probeOnce(): Long = {
      val probe = Vectors.rowResidualAdcProbe(
        Vectors.rowRoute(q, cents), cbRows, cents).drop("q_emb")
      codes2.join(broadcast(probe), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("adist", Vectors.adcLookup)
        .groupBy("q_id")
        .agg(expr("topk_by(adist, vec_id, 3)").as("top"))
        .count()
    }
    probeOnce() // warm
    val (served, tProbe) = time(probeOnce())
    println(f"[resid_persist] warm probe 512 queries: $tProbe%.2f s " +
      f"(${tProbe / 512 * 1e3}%.2f ms/q, $served answered)")
    // staged-insert residual encoding: a 1% delta through FAISS add()
    val delta = graft.Tables.embeddings(spark, dir)
      .filter(pmod(xxhash64(col("vec_id")), lit(100)) === 7)
      .persist()
    val nDelta = delta.count()
    val centRaw = spark.read.parquet(s"$root/centroids")
    val routed = Vectors.routeQueries(
        delta.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
        centRaw, nCells)
      .withColumnRenamed("q_id", "vec_id")
    val rows = delta
      .withColumn("nrm", expr("sqrt(array_dot(embedding, embedding))"))
      .join(routed, "vec_id")
      .select("vec_id", "label", "embedding", "nrm", "cell")
      .persist()
    rows.count()
    val (_, tStage) = time(Vectors.stageInsert(spark, root, rows))
    val staged = Vectors.residualStagedCodes(spark, root).map(_.count()).getOrElse(0L)
    println(f"[resid_persist] staged insert ($nDelta rows, raw+residual " +
      f"encode): $tStage%.1f s (residual codes staged: $staged)")
    Vectors.clearIndexCache(spark)
    spark.stop()
  }
}
