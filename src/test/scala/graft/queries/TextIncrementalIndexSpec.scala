package graft.queries

import graft.SparkSuite
import graft.sources.Bucketed
import org.apache.spark.sql.functions._

/** t26's maintenance half: the gate proves a shard dedups against the
  * persisted index exchange-free; this spec proves the index can then be
  * MAINTAINED — the accepted shard's signatures appended into the same
  * bucketed table — so the next arriving shard dedups against
  * corpus ∪ shard without ever rebuilding. Pins: (1) index-after-append
  * equals the index rebuilt from the full corpus (row multiset), and
  * (2) a subsequent shard's join against the appended index still adds
  * zero exchanges (the bucket spec survives the insert).
  */
class TextIncrementalIndexSpec extends SparkSuite {

  test("append shard signatures == rebuilt index; next shard still exchange-free") {
    val s = spark
    val sh = Text.shingles(s, sf0001, 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val tok = java.lang.Long.toHexString(
        java.util.concurrent.ThreadLocalRandom.current().nextLong())
      val name = s"graft_t26_spec_$tok"
      val path = s"${System.getProperty("java.io.tmpdir")}/$name"
      try {
        val corpus = Text.signatureFrame(sh.filter(col("doc_id") % 10 =!= 7))
        Bucketed.write(corpus, name, path, 8, Seq("bk"))
        val delta = Text.signatureFrame(sh.filter(col("doc_id") % 10 === 7))
        Bucketed.append(delta, name, 8, Seq("bk"))

        val got = Bucketed.table(s, name)
        val want = Text.signatureFrame(sh)
        assert(got.count() == want.count(), "appended index row count drifted")
        assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
          "appended index rows differ from the full-corpus rebuild")

        // a SECOND shard (re-using the delta's signatures as a stand-in)
        // must still join the appended index with zero added exchanges
        val shard2 = delta.withColumnRenamed("doc_id", "doc2")
          .repartition(8, col("bk"))
        val joined = Bucketed.table(s, name).hint("merge")
          .join(shard2.hint("merge"), "bk")
        assert(Bucketed.shuffleCount(joined) == Bucketed.shuffleCount(shard2),
          s"append broke the exchange-free scan:\n${joined.queryExecution.executedPlan}")
        // appends add one file per (insert, bucket): the scan must now
        // see 2 files per bucket and still read bucketed
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("Bucketed: true") || plan.contains("SelectedBucketsCount"),
          s"not a bucketed scan after append:\n$plan")
      } finally {
        s.sql(s"DROP TABLE IF EXISTS `$name`")
        graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(path))
      }
    } finally { sh.unpersist(); () }
  }
}
