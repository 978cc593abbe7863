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
    // 64 floats → 4 codes is a 64× compression; on the clustered synthetic
    // corpus one Lloyd iteration lands well above this floor (~0.5+ when
    // authored) — the floor only guards against degenerate codebooks
    assert(recall >= 0.25, f"PQ recall collapsed: $recall%.3f")
  }

  test("every vector gets exactly 4 subspace codes and codes spread over the codebook") {
    val pq = graft.SparkEntry.queries("v10_pq_adc")(spark, sf001)
    // 20 queries × top-5
    assert(pq.count() == 100)
    assert(pq.groupBy("q_id").count().filter(col("count") =!= 5).count() == 0)
  }
}
