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
}
