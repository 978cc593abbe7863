package graft.queries

import graft.{SparkSuite, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** x1_approx_stats emits (event_type, exact_users, users_ok, p50_ok,
  * p99_ok): the engine checks its own HLL++/percentile_approx sketches
  * against exact aggregates and the DuckDB oracle emits the exact values
  * and literal TRUE — so the driver hash matches iff every bound held.
  * This spec asserts the same contract directly and re-derives the exact
  * side independently so a broken bound-check (e.g. a TRUE literal typo in
  * the engine) can't hide.
  */
class ApproxStatsSpec extends SparkSuite {

  test("sketch bounds hold and exact side matches an independent computation") {
    val out = SparkEntry.queries("x1_approx_stats")(spark, sf001)
    assert(out.columns.toSeq ===
      Seq("event_type", "exact_users", "users_ok", "p50_ok", "p99_ok"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Boolean]("users_ok"), s"users bound failed: $r")
      assert(r.getAs[Boolean]("p50_ok"), s"p50 bound failed: $r")
      assert(r.getAs[Boolean]("p99_ok"), s"p99 bound failed: $r")
    }
    // independent exact side: the emitted exact_users must be a real
    // count-distinct, not a sketch output
    val exact = Tables.events(spark, sf001)
      .groupBy("event_type").agg(countDistinct("user_id").as("users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- rows)
      assert(r.getAs[Long]("exact_users") === exact(r.getAs[String]("event_type")))
  }
}
