package graft.streaming

import graft.SparkSuite
import graft.queries.Text
import org.apache.spark.sql.functions._

/** STAGE LIVENESS of the streaming compound gates (s10 admission, s11
  * composed pipeline) and their index probes — the
  * TextPipelineLivenessSpec pattern spread to the serving tier, per the
  * r15 finding: a gate whose oracle is "the same composition restated"
  * can agree with it on a DEGENERATE output (the t28 decontamination
  * veto passed its oracle on an agreed-empty corpus). Each stage is
  * pinned in both directions: every output row satisfies its
  * constraint, AND at least one input row violates it, so a saturated
  * filter or a dead index consultation fails here even while the
  * hash-match gate stays green.
  */
class StreamLivenessSpec extends SparkSuite {

  test("s10 admission: every stage filters both ways; dedup kills every replay") {
    // sf0.01, not sf0.001: the split stage excludes 2% of ids — at the
    // smallest fixture the ~60-doc delta can contain zero of them and
    // the has-something-to-drop direction is unmeasurable
    val docs = graft.Tables.documents(spark, sf001)
    val delta = Text.streamAdmissionDelta(docs).persist()
    val out = graft.SparkEntry.queries("s10_stream_admission")(spark, sf001)
      .persist()
    try {
      assert(out.count() > 0, "admission returned an empty shard")

      // the delta genuinely contains both populations the stages exist
      // for: fresh shard docs AND re-crawl replays (shifted ids >= 1e9)
      val nFresh = delta.filter(col("doc_id") < 1000000000L).count()
      val nReplay = delta.filter(col("doc_id") >= 1000000000L).count()
      assert(nFresh > 0 && nReplay > 0,
        s"degenerate delta: fresh=$nFresh replays=$nReplay")

      // EXACT-DEDUP anti-join liveness: a replay's text is a corpus
      // doc's text verbatim, so no replay id may survive — and fresh
      // docs must (the index consultation removes rows without vetoing)
      assert(out.filter(col("doc_id") >= 1000000000L).count() == 0,
        "a re-crawl replay slipped past the exact-hash index")
      assert(out.filter(col("doc_id") < 1000000000L).count() > 0,
        "the dedup anti-join vetoed every fresh doc")

      // quality: outputs >= 0.5, and some delta doc scores below
      assert(out.filter(col("quality") < 0.5).count() == 0)
      val nTok = size(split(col("text"), " ", -1))
      val nStop = size(regexp_extract_all(lower(col("text")),
        lit("\\b(the|a|of|and|to|in|is|it)\\b"), lit(0)))
      val quality = least(lit(1.0), col("n_chars") / 400.0) * 0.5 +
        least(lit(0.3), nStop.cast("double") / nTok) * 0.5 / 0.3
      assert(delta.filter(quality < 0.5).count() > 0,
        "quality stage has nothing to drop")

      // split + mixture: both hash filters must exclude someone — from
      // the corpus id space (the delta's %10=7 / +1e9 id pattern happens
      // to contain zero split-excluded ids at the small fixtures; the
      // predicate's liveness is a property of the formula over real ids,
      // pinned here, while t23/t17's own gates pin its exact semantics)
      assert(docs.filter(
        (col("doc_id") * 1103515245L + 12345L) % 1000L >= 980).count() > 0,
        "split stage excludes nothing anywhere in the corpus")
      assert(delta.filter((col("doc_id") * lit(2654435761L)) % 1000000L >=
        (substring(col("source"), 4, 10).cast("long") % 5 + 1) * 200000L)
        .count() > 0, "mixture stage has nothing to drop")

      // PII accounting is live: the augmented text plants three PII
      // tokens per doc, so every output row must count them and the
      // scrub must have shortened/changed the length accordingly
      assert(out.filter(col("n_pii") < 3).count() == 0,
        "PII counting missed the planted tokens")
      assert(out.filter(col("scrub_len") <= 0).count() == 0)
    } finally { out.unpersist(); delta.unpersist(); () }
  }

  test("s11 composed pipeline: both index consultations provably fire both ways") {
    val docs = graft.Tables.documents(spark, sf001)
    val delta = Text.streamAdmissionDelta(docs).persist()
    val out = graft.SparkEntry.queries("s11_stream_pipeline")(spark, sf001)
      .persist()
    try {
      assert(out.count() > 0, "composed streaming pipeline emitted nothing " +
        "(a saturated admission filter agrees with its restated oracle)")

      // doc2 (the stream side) only ever carries ADMITTED SURVIVORS:
      // original shard ids — never a replay (exact-hash index fired),
      // never a bench/corpus id (admission scoping held)
      assert(out.filter(col("doc2") >= 1000000000L).count() == 0,
        "a replay reached the near-dup probe past the exact-hash index")
      assert(out.filter(col("doc2") % 10 =!= 7).count() == 0,
        "a non-shard doc appeared as a probe survivor")

      // doc1 (the corpus side) comes from the t26 signature index:
      // corpus ids only (the index is built over doc_id % 10 != 7)
      assert(out.filter(col("doc1") % 10 === 7).count() == 0,
        "a shard doc appeared on the index side of the probe")

      // the probe REMOVES rows too: not every admitted survivor shares
      // a band with the corpus — candidates must be a strict subset
      val survivors = graft.SparkEntry
        .queries("s10_stream_admission")(spark, sf001)
        .select(col("doc_id").as("doc2"))
      val nSurv = survivors.count()
      val nCand = out.select("doc2").distinct().count()
      assert(nCand > 0 && nCand < nSurv,
        s"index probe is not selective: $nCand candidate docs of " +
          s"$nSurv survivors")
    } finally { out.unpersist(); delta.unpersist(); () }
  }

  test("t26/t27 probes: the index consultation is selective in both directions") {
    // t26: the shard probe must surface SOME candidate pairs (the index
    // answers) while leaving most shard docs unmatched (it filters)
    val t26 = graft.SparkEntry.queries("t26_incremental_dedup")(spark, sf001)
      .persist()
    try {
      val docs = graft.Tables.documents(spark, sf001)
      val shard = docs.filter(col("doc_id") % 10 === 7)
      val nShard = shard.count()
      val matched = t26.select("doc2").distinct().count()
      assert(matched > 0, "t26 probe found nothing — a dead index " +
        "consultation agrees with an empty-join oracle")
      assert(matched < nShard,
        s"t26 probe matched every shard doc ($matched of $nShard): " +
          "the banding is saturated, not selective")
    } finally { t26.unpersist(); () }

    // t27: decontamination flags SOME corpus docs (the screen fires)
    // but not the whole corpus (the r15 veto failure mode)
    val t27 = graft.SparkEntry
      .queries("t27_fuzzy_decontamination")(spark, sf001).persist()
    try {
      val nCorpus = graft.Tables.documents(spark, sf001)
        .filter(col("doc_id") % 50 =!= 0).count()
      val flagged = t27.count()
      assert(flagged > 0, "t27 flagged nothing — the screen is dead")
      assert(flagged < nCorpus / 2,
        s"t27 flagged $flagged of $nCorpus corpus docs — saturated screen")
    } finally { t27.unpersist(); () }
  }
}
