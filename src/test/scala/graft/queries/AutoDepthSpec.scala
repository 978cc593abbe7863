package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The auto band-depth heuristic must make the saturation documented in
  * BASELINE.md self-correcting: at 20k small-vocabulary docs (text
  * minhash) and 50k vectors (hyperplane LSH) the chosen depth must keep
  * chance-collision drops ≈ 0 — max bucket under the occupancy cap —
  * where the fixed shallow defaults measurably saturate
  * (TextLshDepthSpec / VectorsLshDepthSpec).
  */
class AutoDepthSpec extends SparkSuite {

  test("autoDepth solves n / K^d <= target with clamps") {
    // 2^12 = 4096 >= 50000/16 = 3125 → 12
    assert(Lsh.autoDepth(50000, 2.0) === 12)
    assert(Lsh.autoDepth(500, 2.0) === 5) // 2^5 = 32 >= 500/16
    assert(Lsh.autoDepth(10, 2.0) === 2) // floor at minDepth
    assert(Lsh.autoDepth(Long.MaxValue, 2.0) === 24) // ceiling at maxDepth
    assert(Lsh.autoDepth(1000000, 10.0) === 5) // 10^5 >= 1e6/16
  }

  test("measuredDepth escalates until the MEASURED max bucket meets target") {
    // max bucket exactly halves per extra row: ceil(1000/2^d) ≤ 16 first
    // at d = 6, regardless of what the analytic seed modeled
    val d = Lsh.measuredDepth(seed = 2)(d => math.ceil(1000.0 / (1L << d)).toLong)
    assert(d === 6, s"ceil(1000/2^6)=16 needs depth 6, got $d")
  }

  test("measuredDepth stops on a plateau instead of chasing dup mass") {
    // 100 items share ONE key at every depth (a true near-dup cluster no
    // depth can split); the other 1900 halve per extra row. The walk must
    // escalate 3→4→5 while chance collisions dominate (238→119→100) and
    // then STOP once the dup cluster is the max bucket — deepening can't
    // shrink it, that's the occupancy cap's job.
    val d = Lsh.measuredDepth(seed = 3)(
      d => math.max(math.ceil(1900.0 / (1L << d)).toLong, 100L))
    assert(d === 5, s"must stop where the irreducible 100-id cluster plateaus, got $d")
  }

  test("measuredDepth rides out single-probe noise to a deeper argmin") {
    // per-band slot ranges redraw at every depth, so the real curve is
    // noisy (the 20k-doc corpus below measures 128→83→136→19): one bad
    // probe must not end the walk while the next finds a new minimum
    val curve = Map(8 -> 128L, 9 -> 83L, 10 -> 136L, 11 -> 19L, 12 -> 9L)
    val d = Lsh.measuredDepth(seed = 8, maxDepth = 12)(curve)
    assert(d === 12, s"argmin across the noisy tail is 12, got $d")
  }

  // --- text: the TextLshDepthSpec 20k small-vocab corpus --------------------

  private val nDocs = 20000

  private def shingles = spark.range(nDocs)
    .withColumn("seed", expr("CASE WHEN pmod(id, 100) = 99 THEN id - 1 ELSE id END"))
    .select(col("id").as("doc_id"), col("seed"),
      explode(expr(
        """transform(sequence(1, 20),
          |  j -> concat('s', pmod(abs(hash(seed * 131 + j)), 40)))""".stripMargin))
        .as("shingle"))
    .where(expr("NOT (pmod(doc_id, 100) = 99 AND shingle = concat('s', pmod(abs(hash(seed * 131 + 1)), 40)))"))
    .select("doc_id", "shingle")

  test("20k small-vocab docs: auto rows-per-band keeps drops ~ 0") {
    val sh = shingles.persist()
    try {
      val depth = Text.autoRowsPerBand(sh)
      // the 40-token vocabulary collapses the per-slot key space, so the
      // heuristic must deepen well past the shallow default of 2
      assert(depth > 2, s"auto depth $depth should exceed the shallow default")
      val stats = Text.lshBuckets(sh, bands = 4, rowsPerBand = depth)
        .groupBy("band", "bkey").agg(count(lit(1)).as("cnt"))
        .agg(max("cnt").as("max_bucket"),
          sum(greatest(col("cnt") - Lsh.DefaultBucketCap, lit(0))).as("dropped"))
        .collect()(0)
      val (maxBucket, dropped) = (stats.getLong(0), stats.getLong(1))
      assert(dropped === 0L,
        s"auto depth $depth must keep drops at 0, dropped $dropped (max bucket $maxBucket)")
      assert(maxBucket <= Lsh.DefaultBucketCap)
    } finally { sh.unpersist(); () }
  }

  test("20k docs: choosing on a 25% doc sample still keeps drops ~ 0") {
    // the 100 TB protocol: deterministic doc-level sample, measured
    // occupancies scaled back up — the chosen depth must still hold the
    // FULL corpus under the cap
    val sh = shingles.persist()
    try {
      val depth = Text.autoRowsPerBand(sh, sample = 0.25)
      val stats = Text.lshBuckets(sh, bands = 4, rowsPerBand = depth)
        .groupBy("band", "bkey").agg(count(lit(1)).as("cnt"))
        .agg(max("cnt").as("max_bucket"),
          sum(greatest(col("cnt") - Lsh.DefaultBucketCap, lit(0))).as("dropped"))
        .collect()(0)
      assert(stats.getLong(1) === 0L,
        s"sampled choice $depth dropped ${stats.getLong(1)} (max ${stats.getLong(0)})")
    } finally { sh.unpersist(); () }
  }

  // --- vectors: 50k uniform vectors (chance collisions only) ----------------

  private val nVecs = 50000

  private def emb = spark.range(nVecs)
    .select(
      col("id").as("vec_id"),
      expr("""transform(sequence(0, 63),
               d -> cast(hash(id * 64 + d) / 2.147483647E9 as float))""")
        .as("embedding"))

  test("50k vectors: auto planes-per-band keeps drops ~ 0") {
    assert(Vectors.autoPlanesPerBand(nVecs) === 12) // ⌈log2(50000/16)⌉
    // uniform vectors = independent bits, so the measured probe should
    // confirm (not inflate) the analytic seed — it deepens only when the
    // corpus's cluster structure actually correlates the bits
    val depth = Vectors.autoPlanesPerBand(emb, nVecs, Lsh.DefaultTargetOccupancy,
      bands = 4, sample = 1.0)
    assert(depth >= 12 && depth <= 18, s"measured depth $depth")
    val stats = Vectors.lshSignatures(emb, bands = 4, planesPerBand = depth)
      .groupBy("band", "bkey").agg(count(lit(1)).as("cnt"))
      .agg(max("cnt").as("max_bucket"),
        sum(greatest(col("cnt") - Lsh.DefaultBucketCap, lit(0))).as("dropped"))
      .collect()(0)
    val (maxBucket, dropped) = (stats.getLong(0), stats.getLong(1))
    assert(dropped === 0L,
      s"auto depth $depth must keep drops at 0, dropped $dropped (max bucket $maxBucket)")
    assert(maxBucket <= Lsh.DefaultBucketCap)
    // and the shallow oracle-locked depth really is the saturating one here
    val shallowMax = Vectors.lshSignatures(emb, bands = 4, planesPerBand = 4)
      .groupBy("band", "bkey").agg(count(lit(1)).as("cnt"))
      .agg(max("cnt")).collect()(0).getLong(0)
    assert(shallowMax > Lsh.DefaultBucketCap, s"shallow max $shallowMax")
  }

  test("bandsForRecall solves 1-(1-p^d)^b >= recall, monotone in depth") {
    // exact small case: p=0.5, d=1 → pBand=0.5; recall 0.99 needs
    // (1-0.5)^b <= 0.01 → b = 7
    assert(Lsh.bandsForRecall(0.5, 1, 0.99) === 7)
    // the solved b really achieves the recall, and b-1 does not
    for (p <- Seq(0.8, 0.9, 0.955); d <- Seq(2, 4, 8, 12); r <- Seq(0.99, 1 - 1e-6)) {
      val b = Lsh.bandsForRecall(p, d, r)
      val pBand = math.pow(p, d)
      val achieved = 1.0 - math.pow(1.0 - pBand, b)
      if (b < 64) { // un-clamped: solved b achieves the recall, b-1 does not
        assert(achieved >= r - 1e-12, s"p=$p d=$d r=$r b=$b achieved=$achieved")
        if (b > 1)
          assert(1.0 - math.pow(1.0 - pBand, b - 1) < r,
            s"b=$b is not minimal for p=$p d=$d r=$r")
      }
    }
    // deeper bands need at least as many bands for the same recall
    val bs = (1 to 16).map(d => Lsh.bandsForRecall(0.9, d, 0.999))
    assert(bs === bs.sorted, bs.mkString(","))
    // degenerate pBand → clamped at maxBands, never 0 or negative
    assert(Lsh.bandsForRecall(0.5, 60, 1 - 1e-9, maxBands = 64) === 64)
  }
}
