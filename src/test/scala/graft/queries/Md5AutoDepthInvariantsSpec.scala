package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Ratifies the t18 family switch (r20: md5 → xxhash64 band keys, judge
  * item r20-#8): the gate's constant-row oracle cannot see WHICH key
  * family satisfied the invariants, so this spec pins that the md5
  * family AT ITS OWN measured auto depth still satisfies both of them —
  * nothing the pre-r20 gate validated has been lost, the gate merely
  * validates the family the auto banding is actually deployed through
  * (t28b's xx scale path). Same invariant arithmetic as the gate body:
  * occupancy-cap drops stay a 0% corpus fraction, and every confirmed
  * near-dup pair (jaccard ≥ 0.8 on the oracle-locked shallow banding)
  * is still caught by the md5 auto-depth candidates.
  */
class Md5AutoDepthInvariantsSpec extends SparkSuite {

  test("md5 family at its measured auto depth holds both t18 invariants") {
    val dir = sf0001
    val docs = graft.Tables.documents(spark, dir)
    val depth = Text.autoRowsPerBand(
      Text.shinglesOf(docs), sample = 0.5, xxKeys = false)
    val bands = Lsh.bandsForRecall(Text.NearDupJaccard, depth, 1.0 - 1e-6)
    val buckets = Text.rowLshKeysAt(docs, bands, depth)
      .select(lit(0).as("band"), col("bk").as("bkey"), col("doc_id"))
    val cap = Lsh.DefaultBucketCap
    val row = buckets.groupBy("band", "bkey").agg(count(lit(1)).as("bn"))
      .agg(coalesce(sum(greatest(col("bn") - cap, lit(0L))), lit(0L)),
        coalesce(sum(col("bn")), lit(0L)))
      .head()
    val droppedPct = (100L * row.getLong(0)) / math.max(row.getLong(1), 1L)
    assert(droppedPct == 0L,
      s"md5 auto-depth banding ($bands x $depth) dropped $droppedPct% " +
        "of bucket rows past the occupancy cap")
    val cands = Lsh.cappedPairs(
      buckets, "doc_id", "doc1", "doc2", "graft_lsh_text_auto_md5",
      distinctPairs = false)
    val missed = Text.scoredPairsForTesting(spark, dir)
      .filter(col("jaccard") >= 0.8)
      .select("doc1", "doc2")
      .join(cands, Seq("doc1", "doc2"), "left_anti")
      .count()
    assert(missed == 0L,
      s"md5 auto-depth banding ($bands x $depth) missed $missed " +
        "confirmed near-dup pairs")
  }
}
