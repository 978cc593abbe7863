package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall-vs-nprobe sweep for the two-level IVF router — the measured
  * curve behind the serving tier's recall knob (`GRAFT_IVF_NPROBE`).
  * For a real corpus (GenScale embeddings; cells = label clusters, the
  * engine's IVF layout):
  *
  *  - truth: brute-force cosine top-k per sampled query (v1 machinery —
  *    broadcast queries, `topk_by` bounded selection)
  *  - per nprobe: route every query through the two-level quantizer
  *    ([[graft.queries.Vectors.rowRouteHier]]), probe the routed cell,
  *    report recall@k against truth plus exact agreement with the flat
  *    full-quantizer argmax (the routing ceiling: probing the flat
  *    argmax cell is the nprobe→∞ limit of this scheme)
  *
  * Usage: runMain graft.tools.RecallProfile [dir] [nQ] [k] [nprobe...]
  * (defaults: /tmp/scale/x100, 500 queries, k=10, nprobe 1 2 4 8)
  */
object RecallProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale/x100")
    val nQTarget = args.lift(1).map(_.toInt).getOrElse(500)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val probes =
      if (args.length > 3) args.drop(3).map(_.toInt).toSeq else Seq(1, 2, 4, 8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", expr("sqrt(array_dot(v, v))"))
      .persist()
    val nVec = e.count()
    val cents = e
      .select(col("label").cast("int").as("cell"),
        posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("cell", "d").agg(avg("x").as("c"))
      .groupBy("cell")
      .agg(expr("transform(sort_array(collect_list(struct(d, c))), s -> s.c)")
        .as("centroid"))
      .persist()
    val nCells = cents.count()
    val stride = math.max(1L, nVec / nQTarget)
    val q = e.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("q_id"), col("v").as("q_emb"),
        col("nrm").as("q_nrm"))
      .persist()
    val nq = q.count()
    println(s"[recall] dir=$dir vectors=$nVec cells=$nCells queries=$nq k=$k")

    // brute-force truth (self excluded — queries are corpus members)
    val truth = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        expr("array_dot(v, q_emb)") / (col("nrm") * col("q_nrm")))
      .groupBy("q_id").agg(expr(s"topk_by(-cos, vec_id, $k)").as("top"))
      .select(col("q_id"), explode(expr("transform(top, t -> t.id)")).as("vec_id"))
      .persist()
    val nTruth = truth.count()

    // flat full-quantizer argmax cell (routing ceiling): nCells=100
    // forces routeQueries' flat broadcast branch at any real cell count
    val flat = graft.queries.Vectors.routeQueries(
        q.select("q_id", "q_emb"), cents, nCells = 100)
      .withColumnRenamed("cell", "flat_cell").persist()
    flat.count()
    def report(tag: String, routed: org.apache.spark.sql.DataFrame,
        prepSec: Double): Unit = {
      val r = routed.select(col("q_id"), col("q_emb"), col("q_nrm"), col("cell"))
        .persist()
      val agree = r.join(flat, "q_id")
        .filter(col("cell") === col("flat_cell")).count()
      val t0 = System.nanoTime()
      val got = e.select(col("vec_id"), col("label").cast("int").as("cell"),
          col("v"), col("nrm"))
        .join(broadcast(r), "cell")
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cos",
          expr("array_dot(v, q_emb)") / (col("nrm") * col("q_nrm")))
        .groupBy("q_id").agg(expr(s"topk_by(-cos, vec_id, $k)").as("top"))
        .select(col("q_id"),
          explode(expr("transform(top, t -> t.id)")).as("vec_id"))
      val hits = got.join(truth, Seq("q_id", "vec_id"), "left_semi").count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[recall] nprobe=$tag%-4s agree_flat=${agree * 100.0 / nq}%.1f%% " +
        f"recall@$k=${hits.toDouble / nTruth}%.4f prep=$prepSec%.2f " +
        f"probe_sec=$sec%.2f")
      r.unpersist()
    }

    val tH = System.nanoTime()
    val (supers, kids) = graft.queries.Vectors.hierarchyForRowRoute(cents, nCells)
    val hierSec = (System.nanoTime() - tH) / 1e9
    for (np <- probes)
      report(np.toString,
        graft.queries.Vectors.rowRouteHier(q, supers, kids, np), hierSec)
    // ceiling: probe the flat argmax cell itself
    report("flat", q.join(flat, "q_id").withColumnRenamed("flat_cell", "cell"), 0.0)
    spark.stop()
  }
}
