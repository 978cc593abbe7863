package graft.tools

import org.apache.spark.sql.SparkSession

/** Price the PQ byte budget (VERDICT r19 next #4): for every
  * (encoding, M) in {pq, opq} × {8, 16}, train the engine's distributed
  * chain and report corpus quantization error, mean ADC recall@5
  * against the exact L2 top-5, code bytes per vector, and wall-clock —
  * the BASELINE.md rows behind v20 (M knob, hash-exact) and v21 (OPQ
  * invariants). The OPQ rotation trains per (mode, M) on the
  * driver-side sample (queries/Opq.scala).
  *
  * Two corpus modes:
  *  - plain: GenScale as-is. Its dimensions are INDEPENDENT noise
  *    around label centers — the geometry OPQ provably cannot improve
  *    (no inter-dim correlation to rotate away); expect neutral.
  *  - mixed: the corpus pre-rotated by a fixed dense orthogonal Q
  *    (QR of a deterministic matrix), simulating the correlated
  *    features real embedding models emit. Plain PQ degrades on it;
  *    OPQ must recover the gap — the implementation's validity check.
  *
  * Usage: runMain graft.tools.PqVariantsProfile <sfDir> [queryCap=400]
  */
object PqVariantsProfile {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val queryCap = if (args.length > 1) args(1).toInt else 400
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.Tables.embeddings(spark, dir).count()
    println(s"[pqvar] dir=$dir vectors=$n queryCap=$queryCap")
    val sampleRaw = graft.queries.Vectors.embSample(spark, dir)
    val d = sampleRaw(0).length
    val q = graft.queries.Opq.mixer(d)
    // ROW-vector × Q — the same convention Vectors.rotated applies,
    // so the driver-side training sample and the distributed corpus
    // see the SAME mixed space
    def mixRow(x: Array[Double]): Array[Double] =
      Array.tabulate(d)(i => {
        var s = 0.0; var j = 0
        while (j < d) { s += q(j)(i) * x(j); j += 1 }
        s
      })
    for (mode <- Seq("plain", "mixed")) {
      val premix = if (mode == "mixed") Some(q) else None
      val sample = if (mode == "mixed") sampleRaw.map(mixRow) else sampleRaw
      for (m <- Seq(8, 16)) {
        val tTrain0 = System.nanoTime()
        val opq = graft.queries.Opq.train(sample, m, 64, iters = 4,
          lloydIters = 2)
        val trainSec = (System.nanoTime() - tTrain0) / 1e9
        for (enc <- Seq("pq", "opq")) {
          val rot = if (enc == "opq") Some(opq.r) else None
          val cbs = if (enc == "opq") Some(opq.codebooks) else None
          val t0 = System.nanoTime()
          val (err, recall) = graft.queries.Vectors
            .pqVariantEval(spark, dir, m, rot, premix, queryCap, cbs)
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"[pqvar] mode=$mode%-5s enc=$enc%-3s M=$m%2d " +
            f"bytes/vec=$m%2d corpus_err=$err%.4f recall@5=$recall%.4f " +
            f"wall=$sec%.1f s" +
            (if (enc == "opq") f" (opq_train=$trainSec%.1f s, " +
              f"sample_obj ${opq.objectives.head}%.1f -> " +
              f"${opq.objectives.last}%.1f)"
             else ""))
        }
      }
    }
    spark.stop()
  }
}
