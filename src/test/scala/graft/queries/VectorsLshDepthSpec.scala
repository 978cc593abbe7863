package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Signature depth is v2's saturation knob (BASELINE.md: 4-bit bands
  * saturate beyond ~2k vectors). At 50k vectors the shallow oracle-locked
  * depth MUST saturate (pigeonhole: ≥ N/2^4 ids in some band bucket) and
  * the parameterized deeper signature must relieve it — with candidate
  * counts staying bounded by the per-bucket cap, never trending to n²/2.
  */
class VectorsLshDepthSpec extends SparkSuite {

  private val n = 50000
  private val cap = Lsh.DefaultBucketCap // 128

  /** 50k clustered 64-dim vectors, deterministic (hash-derived center +
    * noise) — the GenScale embedding shape at 25× sf0.1.
    */
  private def emb = spark.range(n)
    .withColumn("label", pmod(abs(hash(col("id") * 17)), lit(250)))
    .select(
      col("id").as("vec_id"),
      expr("""transform(sequence(0, 63),
               d -> cast(hash(label * 64 + d) / 2.147483647E9 * 0.8
                       + hash(id * 64 + d) / 2.147483647E9 * 0.3 as float))""")
        .as("embedding"))

  /** (dropped ids beyond cap, max bucket, Σ per-bucket C(min(cnt,cap),2) —
    * the structural upper bound on candidate pairs after capping).
    */
  private def bucketStats(planesPerBand: Int): (Long, Long, Long) = {
    val r = Vectors.lshSignatures(emb, bands = 4, planesPerBand = planesPerBand)
      .groupBy("band", "bkey").agg(count(lit(1)).as("cnt"))
      .agg(
        sum(greatest(col("cnt") - cap, lit(0))).as("dropped"),
        max("cnt").as("max_bucket"),
        sum(expr(s"least(cnt, $cap) * (least(cnt, $cap) - 1) div 2")).as("pair_bound"))
      .collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("50k vectors: shallow bands saturate, deeper bands relieve within the cap") {
    val (droppedShallow, maxShallow, boundShallow) = bucketStats(planesPerBand = 4)
    val (droppedDeep, maxDeep, boundDeep) = bucketStats(planesPerBand = 10)

    // 4-bit bands: ≤16 buckets per band → pigeonhole forces ≥ n/16 in the
    // largest — the saturation BASELINE.md documents, now measured
    assert(maxShallow >= n / 16, s"expected saturation, max bucket $maxShallow")
    assert(droppedShallow > 0)

    // shallow capping is not free: it keeps the bound small by DROPPING
    // ~96% of ids per band (recall loss, observable but severe) — the
    // measured numbers that motivate the depth knob
    assert(droppedShallow > 4L * n / 2, s"shallow drop $droppedShallow")

    // 10-bit bands: 1024 buckets — occupancy falls, most ids survive the
    // cap (candidates now cover the corpus, not a cap-sized sliver)
    assert(droppedDeep < droppedShallow / 4,
      s"deeper bands should relieve drops: $droppedDeep vs $droppedShallow")
    assert(maxDeep < maxShallow)
    assert(droppedDeep.toDouble / (4.0 * n) < 0.25,
      s"deep bands should retain most ids, dropped $droppedDeep of ${4L * n}")
    assert(boundShallow > 0 && boundDeep < n.toLong * (n - 1) / 2 / 100,
      s"deep candidate bound $boundDeep is not sub-quadratic")

    // end-to-end at depth 10: candidates stay inside the structural bound
    // (cap², not n²) and the output contract holds
    val pairs = Vectors.lshSimilarPairs(
      emb, bands = 4, planesPerBand = 10,
      metricName = "graft_lsh_depth_spec").persist()
    try {
      val got = pairs.count()
      assert(got <= boundDeep, s"$got pairs exceeds structural bound $boundDeep")
      assert(got < n.toLong * (n - 1) / 2 / 100, "candidate set is not sub-quadratic")
      assert(pairs.filter(col("v1") >= col("v2") || col("cos") < 0.4).isEmpty)
    } finally { pairs.unpersist(); () }
  }
}
