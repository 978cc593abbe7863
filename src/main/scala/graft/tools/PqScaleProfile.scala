package graft.tools

import org.apache.spark.sql.SparkSession

/** Scaling profile of the ANN ladder's upper rungs: brute (v1) vs PQ ADC
  * (v10) vs IVF-PQ (v11) per embeddings decade. What must hold for the
  * 100 TB story: the PQ train+encode cost grows linearly and is paid
  * once (it is cache-attributed, like the IVF index), the ADC search
  * scales with corpus × queries through the broadcast distance table,
  * and the IVF-PQ composition stays below full-corpus ADC by roughly
  * the cell fraction.
  *
  * Usage: runMain graft.tools.PqScaleProfile <sfDir> [iters]
  */
object PqScaleProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val iters = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val n = graft.Tables.embeddings(spark, dir).count()
    // past ~100k vectors the brute baseline's corpus × queries cross
    // product is the thing the ladder exists to avoid — measuring it once
    // is the finding, re-measuring it is waste. Skipped by default above
    // that size; GRAFT_PQSCALE_SKIP_BRUTE=1|0 overrides either way.
    val skipBrute = sys.env.get("GRAFT_PQSCALE_SKIP_BRUTE")
      .map(_ == "1").getOrElse(n > 100000)
    println(s"[pqscale] corpus $n vectors ($dir) skipBrute=$skipBrute")
    for (i <- 1 to iters) {
      val (nb, tb) =
        if (skipBrute) (-1L, -1.0)
        else time(graft.SparkEntry.queries("v1_knn_brute")(spark, dir).count())
      val (np, tp) = time(graft.SparkEntry.queries("v10_pq_adc")(spark, dir).count())
      val (ni, ti) = time(graft.SparkEntry.queries("v11_ivfpq_adc")(spark, dir).count())
      val (nr, tr) = time(graft.SparkEntry.queries("v12_ivfpq_refine")(spark, dir).count())
      println(f"[pqscale] run$i brute=$tb%.2fs($nb) pq_adc=$tp%.2fs($np) ivfpq=$ti%.2fs($ni) refine=$tr%.2fs($nr)")
    }
    spark.stop()
  }
}
