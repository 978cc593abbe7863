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

  test("v12 refine: within-cell recall@3 beats or ties ADC-only v11") {
    // global-truth recall is bounded by ROUTING (nprobe=1), a v5 property
    // — the tier refine actually owns is ordering WITHIN the routed cell,
    // so ground truth here is the exact-cosine top-3 of each query's cell
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val emb = graft.Tables.embeddings(spark, sf001)
      .withColumn("nrm", sqrt(expr("array_dot(embedding, embedding)")))
    val lab = emb.select(col("vec_id"), col("label"))
    val v11 = graft.SparkEntry.queries("v11_ivfpq_adc")(spark, sf001)
    val qcell = v11.join(lab, "vec_id").select("q_id", "label").distinct()
    val q = emb.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    val exactCell = qcell.join(emb, "label")
      .filter(col("vec_id") =!= col("q_id"))
      .join(q, "q_id")
      .withColumn("cos",
        expr("array_dot(embedding, q_emb)") / (col("nrm") * col("q_nrm")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select("q_id", "vec_id")
    val n = exactCell.select("q_id").distinct().count()
    def recall(qname: String): Double = {
      val got = graft.SparkEntry.queries(qname)(spark, sf001).select("q_id", "vec_id")
      exactCell.join(got, Seq("q_id", "vec_id")).count().toDouble / (n * 3)
    }
    val rRefine = recall("v12_ivfpq_refine")
    val rIvfpq = recall("v11_ivfpq_adc")
    info(f"within-cell recall@3: refine $rRefine%.3f vs ADC-only $rIvfpq%.3f")
    // refine re-ranks a top-10 ADC pool by EXACT cosine: within the cell
    // it can only keep or improve agreement with the exact ordering
    assert(rRefine >= rIvfpq - 1e-9,
      f"refine recall $rRefine%.3f fell below ADC-only $rIvfpq%.3f")
    assert(rRefine >= 0.5, f"refine within-cell recall collapsed: $rRefine%.3f")
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
