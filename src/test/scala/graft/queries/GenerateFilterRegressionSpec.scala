package graft.queries

import graft.SparkSuite

/** Regression pin for the inferred-generate-filter cascade (r17): Spark's
  * InferFiltersFromGenerate + predicate pushdown can inline an expensive
  * inline-array generator child (and everything its aliases reference,
  * down to `split(lower(text))` per element_at) into filter conjuncts
  * evaluated per input row — the pathology that made t5/t19/decon run
  * 4-22× slower on CPU profiles where UTF8String splitting is slow. The
  * fixed shapes explode POSITIONS and build strings once per output row;
  * this spec fails if any shingle-path physical plan grows a Filter that
  * embeds the n-gram lambda again (the cascade's fingerprint), or if t5
  * reacquires an exchange.
  */
class GenerateFilterRegressionSpec extends SparkSuite {

  private def cascadeFilters(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Filter") && l.contains("concat_ws"))
      .toSeq

  test("shingle row pipelines carry no filter that re-evaluates the n-gram lambda") {
    val docs = graft.Tables.documents(spark, sf0001)
    for ((tag, df) <- Seq(
        "shinglesOf(3)" -> Text.shinglesOf(docs, 3),
        "shinglesOf(8)" -> Text.shinglesOf(docs, 8),
        "explodedWithNs" -> Text.explodedWithNsForTesting(docs))) {
      val bad = cascadeFilters(df)
      assert(bad.isEmpty,
        s"$tag regrew the inferred-filter cascade:\n${bad.mkString("\n")}")
    }
  }

  test("t5 fingerprint is map-only: zero exchanges, no generate at all") {
    val df = graft.SparkEntry.queries("t5_fingerprint")(spark, sf0001)
    assert(graft.sources.Bucketed.shuffleCount(df) == 0,
      s"t5 reacquired an exchange:\n${df.queryExecution.executedPlan}")
    assert(!df.queryExecution.executedPlan.toString.contains("Generate"),
      "t5 reacquired an explode — the fingerprint is an array expression")
    assert(df.count() > 0)
  }
}
