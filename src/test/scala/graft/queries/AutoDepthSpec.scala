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

  // --- vectors: 50k uniform vectors (chance collisions only) ----------------

  private val nVecs = 50000

  private def emb = spark.range(nVecs)
    .select(
      col("id").as("vec_id"),
      expr("""transform(sequence(0, 63),
               d -> cast(hash(id * 64 + d) / 2.147483647E9 as float))""")
        .as("embedding"))

  test("50k vectors: auto planes-per-band keeps drops ~ 0") {
    val depth = Vectors.autoPlanesPerBand(nVecs)
    assert(depth === 12) // ⌈log2(50000/16)⌉
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
}
