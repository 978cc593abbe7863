package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared LSH bucket → candidate-pair expansion with bounded bucket
  * occupancy (used by [[Text]] t6/t7/t9 and [[Vectors]] v2).
  *
  * Within-bucket pair generation is quadratic in bucket size; a degenerate
  * corpus (millions of empty/boilerplate documents sharing one signature)
  * would otherwise materialize one O(n) id array and O(n²) pairs inside a
  * single task. Buckets are therefore capped BEFORE any array is built: a
  * row_number window (spillable sort + streamed filter, never an unbounded
  * collect_list) keeps the `cap` smallest ids per bucket; everything beyond
  * the cap is counted and surfaced through a named `observe` metric that
  * [[graft.Metrics]] logs at action time, so a capped run is visible.
  *
  * The kept set is deterministic (lowest ids per bucket), so results are
  * stable across runs and partitionings. Plan shape: ONE shuffle by
  * (band, bkey) — the window's hash partitioning is reused by the
  * downstream groupBy, so capping adds no exchange.
  */
object Lsh {

  /** Default per-bucket occupancy cap: generous for genuine near-dup
    * clusters while bounding the within-bucket explode to cap²/2 pairs and
    * the per-bucket array to `cap` ids regardless of corpus skew.
    */
  val DefaultBucketCap = 128

  /** Default CHANCE-occupancy target for [[autoDepth]]: 8× under the
    * bucket cap, so the cap's headroom absorbs skew and genuine near-dup
    * clusters while chance collisions stay ≈ 0.
    */
  val DefaultTargetOccupancy: Int = DefaultBucketCap / 8

  /** Smallest band depth whose EXPECTED chance occupancy
    * `corpusSize / keySpacePerRow^depth` is ≤ `target` — the self-
    * correcting default for the saturation knob both LSH families expose
    * (BASELINE.md: fixed shallow depths saturate at 100× corpus growth).
    * `keySpacePerRow` is the per-row key-space multiplier: exactly 2 for
    * a hyperplane bit, the measured per-slot minhash key space for text.
    */
  def autoDepth(
      corpusSize: Long, keySpacePerRow: Double,
      target: Int = DefaultTargetOccupancy,
      minDepth: Int = 2, maxDepth: Int = 24): Int = {
    require(keySpacePerRow > 1.0, s"key space per row must exceed 1 ($keySpacePerRow)")
    require(target > 0 && minDepth > 0 && maxDepth >= minDepth)
    var d = minDepth
    var occ = corpusSize.toDouble / math.pow(keySpacePerRow, d)
    while (d < maxDepth && occ > target) { d += 1; occ /= keySpacePerRow }
    d
  }

  /** Distinct within-bucket candidate pairs (`out1` < `out2`) from a
    * (band, bkey, `idCol`) bucket assignment, with per-bucket occupancy
    * bounded by `cap`. `metricName` names the observe row carrying
    * (dropped_ids, max_bucket).
    */
  private[queries] def cappedPairs(
      buckets: DataFrame, idCol: String, out1: String, out2: String,
      metricName: String, cap: Int = DefaultBucketCap,
      spreadHot: Boolean = false, distinctPairs: Boolean = true,
      payload: Option[(String, String, String)] = None): DataFrame = {
    graft.Metrics.logObserved(buckets.sparkSession)
    val byBucket = Window.partitionBy("band", "bkey")
    val kept = buckets
      .withColumn("rn", row_number().over(byBucket.orderBy(col(idCol))))
      .withColumn("bn", count(lit(1)).over(byBucket))
      .filter(col("rn") <= cap)
      .observe(
        metricName,
        sum(when(col("rn") === 1, greatest(col("bn") - cap, lit(0)))
          .otherwise(lit(0))).as("dropped_ids"),
        max(col("bn")).as("max_bucket"))
    // within-bucket pairs as TWO position explodes (i < j index pairs,
    // element_at after) rather than exploding one flattened m²/2-struct
    // array: the inline flatten(transform(transform(...))) child gets
    // re-evaluated in the two filter conjuncts InferFiltersFromGenerate
    // adds (pushdown stops at the aggregate, so the whole pair-struct
    // array built 3× per bucket — the r17 generate-filter pathology,
    // here in its agg-bounded form), while the position sequences cost
    // ints and both generates + the element_at projection fuse into one
    // codegen stage with no per-pair array state. Pair SET is identical:
    // (ids[i], ids[j]) over the same sorted array, i < j.
    // payload = Some((col, p1, p2)): each id's per-row payload rides the
    // collected list and is emitted on both pair sides (r21, t20) — the
    // consumer then re-ranks map-side instead of re-joining the source
    // frame once per pair side (two exchanges + two join stages saved;
    // the payload is id-determined, so the pair SET and any distinct are
    // unchanged). sort_array over (id, payload) structs orders by id —
    // ids are distinct within a bucket — so pair order is identical.
    val collected = payload match {
      case Some((pcol, _, _)) =>
        sort_array(collect_list(struct(col(idCol).as("k"), col(pcol).as("p"))))
      case None => sort_array(collect_list(col(idCol)))
    }
    val iRows = kept
      .groupBy("band", "bkey").agg(collected.as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(col("ids"), explode(expr("sequence(1, size(ids)-1)")).as("i"))
    // spreadHot: a bucket's quadratic j-explode otherwise runs entirely
    // inside the bucket's own task — at a large cap (t20's 1024) one hot
    // block key is a single-task O(cap²/2) straggler (measured 3 s serial
    // at sf0.1, the whole gate's tail). Redistributing the (ids, i) rows
    // first costs one bucket-count-bounded exchange and parallelizes the
    // pair generation row-by-row; skew-immune by construction (every
    // i-row of a hot bucket is the same size-1 unit of work). Off by
    // default: at the standard cap the explode is bounded small and the
    // extra exchange is pure overhead.
    val jSource =
      if (spreadHot)
        iRows.repartition(buckets.sparkSession.sparkContext.defaultParallelism)
      else iRows
    val jRows = jSource
      .select(col("ids"), col("i"),
        explode(expr("sequence(i+1, size(ids))")).as("j"))
    val pairs = payload match {
      case Some((_, p1, p2)) => jRows.selectExpr(
        s"element_at(ids, i).k AS $out1", s"element_at(ids, j).k AS $out2",
        s"element_at(ids, i).p AS $p1", s"element_at(ids, j).p AS $p2")
      case None => jRows.selectExpr(
        s"element_at(ids, i) AS $out1", s"element_at(ids, j) AS $out2")
    }
    // distinctPairs=false skips the cross-band dedup exchange for
    // consumers where multiplicity is immaterial — the t18/v9 superset
    // gates only ever put the pairs on the RIGHT of a left_anti join
    // (r21; one exchange + AQE round less per invocation). Every consumer
    // that emits or joins the pair set keeps the distinct.
    if (distinctPairs) pairs.distinct() else pairs
  }

  /** Smallest band count that keeps recall for a pair whose per-row match
    * probability is `p` when bands are `depth` rows deep:
    * 1-(1-p^depth)^bands ≥ recall. Deepening bands to control occupancy
    * DECAYS recall exponentially (the x10 v9 sweep measured a 4-band
    * depth-raised banding losing thousands of confirmed near-dup pairs);
    * the two knobs must move together — depth from the occupancy
    * measurement, bands from this closed form at the similarity the dedup
    * tier must keep catching.
    */
  def bandsForRecall(p: Double, depth: Int, recall: Double,
      maxBands: Int = 64): Int = {
    require(p > 0.0 && p < 1.0, s"per-row match probability must be in (0,1): $p")
    require(recall > 0.0 && recall < 1.0 && depth > 0 && maxBands > 0)
    val pBand = math.pow(p, depth)
    val b = math.ceil(math.log1p(-recall) / math.log1p(-pBand))
    math.min(maxBands, math.max(1, if (b.isFinite) b.toInt else maxBands))
  }

  /** Smallest band depth whose MEASURED max bucket occupancy meets
    * `target` — or, if no probed depth reaches it, the depth with the
    * smallest occupancy seen.
    *
    * [[autoDepth]]'s closed form assumes bucket keys compose independently
    * per row; real signatures don't — partially-overlapping documents
    * correlate their minhash slots, clustered embeddings correlate their
    * hyperplane bits — and the x100 profile (BASELINE.md) measured the
    * analytic depth leaving thousands of capped drops that two extra rows
    * eliminate. So: measure instead of model. `maxBucketAt(d)` must return
    * the max bucket occupancy over ALL bands of the depth-`d` banding
    * (band `b` keys on its OWN slot range `[d·b, d·b+d)`, which redraws as
    * `d` grows — a single band's nested prefix under-measures the band
    * that happens to draw popular slots). One probe is one count-by-key
    * aggregate over the n-item signature frame — cheap next to the bucket
    * shuffle it tunes, and at 100 TB it runs on a doc sample like the
    * analytic seed it replaces.
    *
    * Escalation starts at `seed` (the analytic estimate — a floor in
    * practice, since slot correlation only ever INCREASES occupancy over
    * the independence model). Because the per-band slot redraw makes the
    * curve noisy rather than monotone, the walk keeps the argmin and stops
    * at `target`, at `maxDepth`, or after `patience` consecutive probes
    * without improvement — the plateau that marks genuine near-dup mass
    * sharing its whole signature, which no depth can split and the
    * occupancy cap + observed-drop metric are designed to absorb.
    */
  private[graft] def measuredDepth(
      seed: Int, maxDepth: Int = 24,
      target: Int = DefaultTargetOccupancy, patience: Int = 2)(
      maxBucketAt: Int => Long): Int = {
    var d = math.min(seed, maxDepth)
    var best = maxBucketAt(d)
    var bestD = d
    var stale = 0
    while (d < maxDepth && best > target && stale < patience) {
      d += 1
      val m = maxBucketAt(d)
      if (m < best) { best = m; bestD = d; stale = 0 } else stale += 1
    }
    bestD
  }
}
