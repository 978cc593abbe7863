package graft

/** Every registered query must run at sf0.001 and return rows, and every
  * oracle key must exist in the query map (driver contract).
  */
class QueriesSmokeSpec extends SparkSuite {

  test("oracleSql keys are a subset of queries keys") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name runs at sf0.001 with rows > 0") {
      val df = SparkEntry.queries(name)(spark, sf0001)
      assert(df.count() > 0)
    }
  }

  test("t19 df-cap drops are observed (graft_t19_df_cap metric row fires)") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    @volatile var observed: Option[(Long, Long)] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        qe.observedMetrics.get("graft_t19_df_cap").foreach { r =>
          observed = Some((r.getLong(0), r.getLong(1)))
        }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      SparkEntry.queries("t19_substring_overlap")(spark, sf0001).count()
      val deadline = System.currentTimeMillis + 30000
      while (observed.isEmpty && System.currentTimeMillis < deadline) Thread.sleep(50)
      assert(observed.nonEmpty, "graft_t19_df_cap observe row never delivered")
      val (dropped, maxDf) = observed.get
      assert(dropped >= 0 && maxDf >= 1)
    } finally spark.listenerManager.unregister(listener)
  }
}
