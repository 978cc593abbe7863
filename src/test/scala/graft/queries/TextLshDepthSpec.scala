package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Band depth is the minhash pipeline's saturation knob (BASELINE.md x100
  * reading: at 500k docs the oracle-locked 4×2 banding's chance collisions
  * dominate t6's candidate set). At 20k small-vocabulary docs the 2-row
  * band keys must produce heavy chance bucketing and the parameterized
  * 4-row keys must relieve it, while every true near-duplicate pair keeps
  * colliding at full depth.
  */
class TextLshDepthSpec extends SparkSuite {

  private val n = 20000

  /** Deterministic small-vocab shingle frame: every 100th doc near-repeats
    * its predecessor (shares all but one shingle) — the GenScale documents
    * shape with the vocabulary saturation cranked up.
    */
  private def shingles = spark.range(n)
    .withColumn("seed", expr("CASE WHEN pmod(id, 100) = 99 THEN id - 1 ELSE id END"))
    .select(col("id").as("doc_id"), col("seed"),
      explode(expr(
        """transform(sequence(1, 20),
          |  j -> concat('s', pmod(abs(hash(seed * 131 + j)), 40)))""".stripMargin))
        .as("shingle"))
    .where(expr("NOT (pmod(doc_id, 100) = 99 AND shingle = concat('s', pmod(abs(hash(seed * 131 + 1)), 40)))"))
    .select("doc_id", "shingle")

  private def bucketStats(rowsPerBand: Int): (Long, Long) = {
    val r = Text.lshBuckets(shingles, bands = 4, rowsPerBand = rowsPerBand)
      .groupBy("band", "bkey").agg(count(lit(1)).as("cnt"))
      .agg(max("cnt").as("max_bucket"),
        sum(expr("cnt * (cnt - 1) div 2")).as("pair_bound"))
      .collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("20k docs: 2-row bands saturate, 4-row bands relieve collisions") {
    val (maxShallow, boundShallow) = bucketStats(rowsPerBand = 2)
    val (maxDeep, boundDeep) = bucketStats(rowsPerBand = 4)
    // a 40-token vocabulary saturates 2-hash keys: some bucket collects
    // a corpus-scale fraction of the docs
    assert(maxShallow > n / 50, s"expected chance-collision saturation, max $maxShallow")
    // 4-row keys cut the quadratic pair bound several-fold (measured ≈9×
    // on this corpus; the relief grows exponentially with rows per band)
    assert(boundDeep < boundShallow / 5,
      s"deeper bands should relieve the pair bound: $boundDeep vs $boundShallow")
    assert(maxDeep < maxShallow)
  }

  test("true near-duplicates keep colliding at full depth") {
    val buckets = Text.lshBuckets(shingles, bands = 4, rowsPerBand = 4)
    val b2 = buckets.select(col("doc_id").as("doc2"), col("band"), col("bkey"))
    // every (100k-1, 100k-1 +? ) near-dup pair (seed sharing) must share
    // at least one band bucket: they differ by ONE shingle out of ~20
    val expected = spark.range(n).filter(pmod(col("id"), lit(100)) === 99)
      .select((col("id") - 1).as("doc_id"), col("id").as("doc2"))
    val found = buckets.join(b2, Seq("band", "bkey"))
      .filter(col("doc_id") < col("doc2"))
      .select("doc_id", "doc2").distinct()
    val missed = expected.join(found, Seq("doc_id", "doc2"), "left_anti").count()
    val total = expected.count()
    // minhash is probabilistic: near-identical sets agree per hash with
    // p ≈ 19/21; a 4-row band matches with p ≈ 0.66, any of 4 bands ≈ 0.99
    assert(missed <= total / 20, s"missed $missed of $total true near-dup pairs")
  }
}
