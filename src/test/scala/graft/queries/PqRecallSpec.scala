package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Quality gate for v10's product quantization: the hash-exact oracle
  * proves both engines compute the SAME ADC ranking, but not that the
  * ranking is any good — this spec measures recall of ADC top-5 against
  * the exact cosine top-5 (v1's ground truth) on the real corpus, so a
  * silent codebook degeneration (e.g. all vectors collapsing onto one
  * code) fails loudly instead of hash-matching its own garbage.
  */
class PqRecallSpec extends SparkSuite {

  test("ADC top-5 recalls a meaningful fraction of exact top-5") {
    val pq = graft.SparkEntry.queries("v10_pq_adc")(spark, sf001)
      .select(col("q_id"), col("vec_id"))
    val exact = graft.SparkEntry.queries("v1_knn_brute")(spark, sf001)
      .select(col("q_id"), col("vec_id"))
    val nQueries = exact.select("q_id").distinct().count()
    val hits = exact.join(pq, Seq("q_id", "vec_id")).count()
    val recall = hits.toDouble / (nQueries * 5)
    info(f"PQ ADC recall@5 vs exact top-5: $recall%.3f over $nQueries queries")
    // 64 floats → 8 codes is a 32× compression; on the clustered synthetic
    // corpus the two Lloyd iterations land ~0.42 (measured when authored) —
    // the floor only guards against degenerate codebooks
    assert(recall >= 0.25, f"PQ recall collapsed: $recall%.3f")
  }

  test("v10 output shape: exactly 5 ranked rows per query") {
    val pq = graft.SparkEntry.queries("v10_pq_adc")(spark, sf001)
    // 20 queries × top-5
    assert(pq.count() == 100)
    assert(pq.groupBy("q_id").count().filter(col("count") =!= 5).count() == 0)
  }

  test("v11 cell-pruned results are a subset of the same query's cell") {
    val v11 = graft.SparkEntry.queries("v11_ivfpq_adc")(spark, sf001)
    assert(v11.count() == 60) // 20 queries × top-3
    // every result shares its query's routed cell: joined to labels, each
    // (q_id) group must span exactly one label
    val lab = graft.Tables.embeddings(spark, sf001).select(col("vec_id"), col("label"))
    val spread = v11.join(lab, "vec_id")
      .groupBy("q_id").agg(countDistinct("label").as("nl"))
      .filter(col("nl") =!= 1).count()
    assert(spread == 0, "v11 returned vectors outside the routed cell")
  }
}
