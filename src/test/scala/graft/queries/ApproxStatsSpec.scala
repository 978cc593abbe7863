package graft.queries

import graft.{SparkSuite, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** x1_approx_stats has no SQL oracle (sketch implementations differ across
  * engines) — this spec is its correctness gate: sketch results must land
  * within the configured error of the exact answers.
  */
class ApproxStatsSpec extends SparkSuite {

  test("approx sketches bound error against exact answers") {
    val approx = SparkEntry.queries("x1_approx_stats")(spark, sf001)
    val exact = Tables.events(spark, sf001)
      .groupBy("event_type")
      .agg(
        countDistinct("user_id").as("users"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.99)").as("p99"))
    val joined = approx.join(exact, "event_type").collect()
    assert(joined.nonEmpty)
    for (r <- joined) {
      val (au, eu) = (r.getAs[Long]("approx_users").toDouble, r.getAs[Long]("users").toDouble)
      assert(math.abs(au - eu) / eu < 0.05, s"distinct off: $au vs $eu")
      val (ap50, ep50) = (r.getAs[Double]("approx_p50"), r.getAs[Double]("p50"))
      assert(math.abs(ap50 - ep50) < 0.05 * math.max(1.0, math.abs(ep50)),
        s"p50 off: $ap50 vs $ep50")
    }
  }
}
