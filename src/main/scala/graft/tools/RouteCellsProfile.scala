package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-row cost of the RESIDUAL serving pipeline across cell-count
  * decades (VERDICT r18 next #3's measurement): `ivf_route_cells`
  * (top-k cells + centroids from broadcast state) alone, then the full
  * s14 map-side derivation (route → per-cell residual → 512-entry ADC
  * table). Work per row = route (~2·√cells fused dots hierarchical,
  * cells dots flat) + k × (64-dim subtraction + 512 table entries) —
  * the table is cell-count-INDEPENDENT, so the route term is what the
  * sweep isolates.
  *
  * Usage: runMain graft.tools.RouteCellsProfile [nQueries] [cells...]
  * (defaults: 20000 queries; 4096 16384 65536).
  */
object RouteCellsProfile {
  def main(args: Array[String]): Unit = {
    val nQ = args.headOption.map(_.toInt).getOrElse(20000)
    val budgets =
      if (args.length > 1) args.tail.map(_.toLong).toSeq
      else Seq(4096L, 16384L, 65536L)
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
    // an arbitrary deterministic 8×64 codebook: ADC-table cost does not
    // depend on the trained values, only on M×K×sub shape
    val cb: Array[(Int, Int, Seq[Double])] =
      (for (s <- 0 until 8; c <- 0 until 64) yield {
        (s, c, (0 until 8).map(d =>
          ((s * 64 + c) * 8 + d).hashCode.toDouble / Int.MaxValue))
      }).toArray

    for (cells <- budgets) {
      val c = centroids(cells).persist(); c.count()
      val q = queries(cells).persist(); q.count()
      val tp0 = System.nanoTime()
      val state = graft.queries.Vectors.hierRouterState(c, cells)
      val prepSec = (System.nanoTime() - tp0) / 1e9
      val routed = graft.queries.Vectors.rowRouteCells(
        q, state, superProbe = 2, k = 2)
      routed.count() // warm
      val tr0 = System.nanoTime()
      val nRouted = routed.count()
      val routeSec = (System.nanoTime() - tr0) / 1e9
      val probe = graft.queries.Vectors.rowRouteCellsResidualProbe(
        q, state, cb, superProbe = 2, k = 2)
      probe.count() // warm
      val tf0 = System.nanoTime()
      val nProbe = probe.count()
      val fullSec = (System.nanoTime() - tf0) / 1e9
      println(f"[route_cells] cells=$cells%6d queries=$nQ k=2 " +
        f"prep=$prepSec%.2f route_sec=$routeSec%.2f " +
        f"(${routeSec / nQ * 1e6}%.1f us/q, $nRouted rows) " +
        f"route+dtab_sec=$fullSec%.2f (${fullSec / nQ * 1e6}%.1f us/q, " +
        f"$nProbe rows)")
      c.unpersist(); q.unpersist()
    }
    spark.stop()
  }
}
