package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** IVF routing scale profile: at a FIXED query count, sweep the cell
  * budget across decades and time [[graft.queries.Vectors.routeQueries]]
  * (flat below the hierarchy threshold, hierarchical √cells routing
  * above). Prints one line per budget; the per-decade exponent
  * e = log(tᵢ₊₁/tᵢ)/log(cellsᵢ₊₁/cellsᵢ) across the hierarchical decades
  * is the scaling verdict — flat routing is e ≈ 1 (queries × cells),
  * the coarse quantizer targets e ≈ 0.5.
  *
  * Usage: runMain graft.tools.RouteProfile [nQueries] [cells...]
  * (defaults: 20000 queries; 1024 4096 16384 65536 cells — the x1000
  * GenScale embedding decade has 10k cells, inside this sweep).
  */
object RouteProfile {
  def main(args: Array[String]): Unit = {
    val nQ = args.headOption.map(_.toInt).getOrElse(20000)
    val budgets =
      if (args.length > 1) args.tail.map(_.toLong).toSeq
      else Seq(1024L, 4096L, 16384L, 65536L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dims = 64

    def centroids(nCells: Long) = {
      val nRegions = math.ceil(math.sqrt(nCells.toDouble)).toLong
      spark.range(nCells)
        .withColumn("region", pmod(abs(hash(col("id") * 31)), lit(nRegions)))
        .select(
          col("id").cast("int").as("cell"),
          expr(s"""transform(sequence(0, ${dims - 1}),
                    d -> cast(hash(region * 64 + d) / 2.147483647E9 * 0.8
                            + hash(id * 64 + d) / 2.147483647E9 * 0.3 as double))""")
            .as("centroid"))
    }
    def queries(nCells: Long) = {
      val nRegions = math.ceil(math.sqrt(nCells.toDouble)).toLong
      spark.range(nQ)
        .withColumn("home", pmod(abs(hash(col("id") * 13)), lit(nCells)))
        .withColumn("hr", pmod(abs(hash(col("home") * 31)), lit(nRegions)))
        .select(
          col("id").as("q_id"),
          expr(s"""transform(sequence(0, ${dims - 1}),
                    d -> cast((hash(hr * 64 + d) / 2.147483647E9 * 0.8
                             + hash(home * 64 + d) / 2.147483647E9 * 0.3) * 0.9
                            + hash(id * 64 + d) / 2.147483647E9 * 0.2 as double))""")
            .as("q_emb"))
    }

    var prev: Option[(Long, Double)] = None
    for (cells <- budgets) {
      val c = centroids(cells).persist(); c.count()
      val q = queries(cells).persist(); q.count()
      // warm-up then timed run
      graft.queries.Vectors.routeQueries(q, c, cells).count()
      val t0 = System.nanoTime()
      val routed = graft.queries.Vectors.routeQueries(q, c, cells).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val e = prev.map { case (pc, pt) =>
        f"${math.log(sec / pt) / math.log(cells.toDouble / pc)}%.2f"
      }.getOrElse("-")
      val mode = if (cells <= graft.queries.Vectors.HierarchicalRoutingThreshold)
        "flat" else "hier"
      println(f"[route] cells=$cells%6d mode=$mode queries=$nQ routed=$routed " +
        f"sec=$sec%.2f e_vs_prev=$e")
      // the SERVING tier's per-row form at the same budget — what each
      // arriving stream row pays (flat literals below the threshold,
      // two-level super literals + broadcast children above). Quantizer
      // prep (collect / hierarchy build) is timed separately: it is
      // per-index-build state, not per-query cost.
      val tp0 = System.nanoTime()
      val perRow =
        if (cells <= graft.queries.Vectors.HierarchicalRoutingThreshold) {
          val cents = c.orderBy("cell").collect()
            .map(r => (r.getInt(0), r.getSeq[Double](1)))
          graft.queries.Vectors.rowRoute(q, cents)
        } else {
          val (supers, kids) =
            graft.queries.Vectors.hierarchyForRowRoute(c, cells)
          graft.queries.Vectors.rowRouteHier(q, supers, kids)
        }
      val prepSec = (System.nanoTime() - tp0) / 1e9
      perRow.count() // warm
      val tr0 = System.nanoTime()
      val rowRouted = perRow.count()
      val rowSec = (System.nanoTime() - tr0) / 1e9
      println(f"[route] cells=$cells%6d mode=row-$mode queries=$nQ " +
        f"routed=$rowRouted prep=$prepSec%.2f sec=$rowSec%.2f " +
        f"(${rowSec / nQ * 1e6}%.1f us/query)")
      prev = Some((cells, sec))
      c.unpersist(); q.unpersist()
    }
    spark.stop()
  }
}
