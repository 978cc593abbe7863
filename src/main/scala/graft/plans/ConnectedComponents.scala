package graft.plans

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the Pregel
  * pattern restated on DataFrames: each round is one join+groupBy, the
  * number of rounds is the graph diameter (near-dup clusters are shallow,
  * typically 2–4 rounds).
  *
  * Scale notes, by design:
  *   - per-round lineage is cut with a checkpoint, otherwise the plan
  *     doubles every round and the optimizer runs in O(2^rounds);
  *   - convergence is detected with an `observe` metric computed on the
  *     SAME rows the checkpoint materializes, so each round costs exactly
  *     ONE Spark action (the eager checkpoint) — not a second
  *     compare-and-count job re-running the join;
  *   - `localCheckpoint` (default) pins partitions in executor storage:
  *     right for a single-JVM/local run. On a real cluster a lost executor
  *     loses the pinned partitions AND the truncated lineage, so callers
  *     set a reliable checkpoint dir (`sc.setCheckpointDir`) and we detect
  *     it and use fault-tolerant `checkpoint()` instead.
  */
object ConnectedComponents {

  /** Cut lineage: reliable `checkpoint()` when the session has a
    * checkpoint dir configured, `localCheckpoint()` otherwise.
    */
  private def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** Label each vertex with the minimum vertex id reachable from it.
    *
    * `vertices`: one column `idCol` (vertex universe — isolated vertices
    * keep their own id as label). `edges`: columns `a`, `b` — must already
    * be symmetric (both directions present) or components spanning only
    * one direction will split.
    *
    * Returns (`idCol`, `labelCol`).
    */
  def minLabel(
      vertices: DataFrame,
      idCol: String,
      edges: DataFrame,
      labelCol: String = "label"): DataFrame = {
    // internals run on reserved names so an idCol/labelCol of "a"/"b" (the
    // edge-frame contract names) can never be captured by the join below
    val ed = cut(edges.select(col("a").as("_cc_src"), col("b").as("_cc_dst")))
    var labels = cut(vertices.select(
      col(idCol).as("_cc_id"), col(idCol).as("_cc_lbl")))
    var changed = 1L
    while (changed > 0) {
      val obs = Observation()
      val neigh = ed
        .join(labels.select(col("_cc_id").as("_cc_dst"), col("_cc_lbl")), "_cc_dst")
        .groupBy(col("_cc_src").as("_cc_id")).agg(min("_cc_lbl").as("_nl"))
      val joined = labels.join(neigh, Seq("_cc_id"), "left")
        .withColumn("_chg",
          (coalesce(col("_nl"), col("_cc_lbl")) < col("_cc_lbl")).cast("long"))
        .observe(obs, coalesce(sum(col("_chg")), lit(0L)).as("changed"))
        .select(col("_cc_id"),
          least(col("_cc_lbl"), coalesce(col("_nl"), col("_cc_lbl"))).as("_cc_lbl"))
      labels = cut(joined) // eager checkpoint = the round's ONE action
      changed = obs.get("changed").asInstanceOf[Long]
    }
    labels.select(col("_cc_id").as(idCol), col("_cc_lbl").as(labelCol))
  }
}
