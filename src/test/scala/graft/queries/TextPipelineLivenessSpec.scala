package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** STAGE LIVENESS of the composed pipeline (t28): the x10 oracle sweep
  * caught the gate agreeing with its oracle on an EMPTY result after the
  * decontamination stage saturated — oracle agreement alone cannot
  * distinguish "stage works" from "stage vetoes everything" (or from
  * "stage is dead code"). This spec pins, per stage, both directions:
  * every output row satisfies the stage's constraint, AND at least one
  * input document violates it (so the stage provably removed rows).
  * Stages whose liveness needs other scales are pinned elsewhere: the
  * per-source cap binds at x10 (BASELINE round-15 sweep), exact/near-dup
  * removal by their own gates (t1/t9) and the t26 x10 rows.
  */
class TextPipelineLivenessSpec extends SparkSuite {

  test("every t28 stage constrains the output AND removes input rows") {
    val out = graft.SparkEntry.queries("t28_pipeline")(spark, sf0001)
      .persist()
    try {
      val docs = graft.Tables.documents(spark, sf0001)
      assert(out.count() > 0, "composed pipeline returned an empty corpus")

      // bench holdout: no bench doc in the output; bench docs exist
      assert(out.filter(col("doc_id") % 50 === 0).count() == 0)
      assert(docs.filter(col("doc_id") % 50 === 0).count() > 0)

      // quality filter: all outputs >= 0.5; at least one non-bench doc
      // scores below (same formula as the gate — a constant drift here
      // fails loudly rather than silently weakening the check)
      assert(out.filter(col("quality") < 0.5).count() == 0)
      val nTok = size(split(col("text"), " ", -1))
      val nStop = size(regexp_extract_all(lower(col("text")),
        lit("\\b(the|a|of|and|to|in|is|it)\\b"), lit(0)))
      val quality = least(lit(1.0), col("n_chars") / 400.0) * 0.5 +
        least(lit(0.3), nStop.cast("double") / nTok) * 0.5 / 0.3
      assert(docs.filter(col("doc_id") % 50 =!= 0)
        .filter(quality < 0.5).count() > 0, "quality stage has nothing to drop")

      // split assign: at least one doc hashes out of the train split
      assert(docs.filter(
        (col("doc_id") * 1103515245L + 12345L) % 1000L >= 980).count() > 0)

      // mixture sampling: at least one doc fails its source's admission
      assert(docs.filter((col("doc_id") * lit(2654435761L)) % 1000000L >=
        (substring(col("source"), 4, 10).cast("long") % 5 + 1) * 200000L)
        .count() > 0)

      // decontamination: at least one non-bench doc crosses the 0.5
      // contamination ratio (>= half its 3-shingles appear in the bench
      // set) — the stage that silently saturated at x10
      val sh = Text.shingles(spark, sf0001, 3)
      val bench = sh.filter(col("doc_id") % 50 === 0)
        .select("shingle").distinct()
      val ns = sh.groupBy("doc_id").agg(count(lit(1)).as("ns"))
      val contaminated = sh.filter(col("doc_id") % 50 =!= 0)
        .join(bench, "shingle")
        .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
        .join(ns, "doc_id")
        .filter(col("n_overlap").cast("double") / col("ns") >= 0.5)
      assert(contaminated.count() > 0, "decontamination has nothing to drop")
      assert(out.join(contaminated.select("doc_id"), Seq("doc_id"), "left_semi")
        .count() == 0, "a contaminated doc survived the pipeline")

      // cap + pack invariants on the released rows
      val bad = out.filter(col("rk") > 25 || col("rk") < 1 ||
        col("seq_off") < 0 || col("seq_off") >= 256 || col("seq_id") < 0)
      assert(bad.count() == 0, "cap/pack invariant violated")
    } finally { out.unpersist(); () }
  }
}
