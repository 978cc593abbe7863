package graft.queries

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** The Spark side of the BPE tier: the mapPartitions batch kernel must
  * agree with the driver-side encoder doc-for-doc (the kernel IS just
  * the encoder behind a broadcast — this pins the plumbing: broadcast
  * rebuild, row wiring, schema), the trained encoder must be memoized
  * per (session, corpus), and the gate invariants must hold live.
  */
class TokenizeSpec extends SparkSuite {

  test("kernel token stats == driver-side encode, doc for doc (sf0.001)") {
    val e = Tokenize.encoderFor(spark, sf0001)
    val got = Tokenize.tokenStats(spark, sf0001)
      .select("doc_id", "n_tok", "tok_bytes", "rt_ok")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
    assert(docs.nonEmpty && got.size == docs.length)
    docs.foreach { r =>
      val ids = e.encode(r.getString(1))
      val expect = (ids.length.toLong, ids.map(e.byteLen(_).toLong).sum, true)
      assert(got(r.getLong(0)) == expect,
        s"doc ${r.getLong(0)}: kernel ${got(r.getLong(0))} vs driver $expect")
    }
  }

  test("whole-corpus roundtrip and tiling hold at sf0.01") {
    val agg = Tokenize.tokenStats(spark, sf001)
      .agg(sum(when(!col("rt_ok"), 1L).otherwise(0L)).as("rt_fails"),
        sum("tok_bytes").as("tb"),
        max("max_id").as("mx"))
      .head()
    assert(agg.getLong(0) == 0L, s"${agg.getLong(0)} roundtrip failures")
    val rawBytes = Tables.documents(spark, sf001)
      .agg(sum(octet_length(col("text")))).head().getLong(0)
    assert(agg.getLong(1) == rawBytes,
      s"token bytes ${agg.getLong(1)} != corpus bytes $rawBytes")
    assert(agg.getInt(2) < 256 + Tokenize.NumMerges)
  }

  test("the encoder trains once per (session, corpus)") {
    val e1 = Tokenize.encoderFor(spark, sf0001)
    val e2 = Tokenize.encoderFor(spark, sf0001)
    assert(e1 eq e2, "encoder re-trained for the same (session, corpus)")
    // sf0.001's 50-doc synthetic corpus exhausts its repeating pairs
    // before the full merge budget — early stop is by design; what must
    // hold is real compression structure and the budget as a ceiling
    assert(e1.merges.length >= 64 && e1.merges.length <= Tokenize.NumMerges,
      s"implausible merge count for the sf0.001 sample: ${e1.merges.length}")
  }

  test("t16b packing semantics: token budget respected up to the straddling doc") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("doc_id")
    val packed = Tokenize.tokenStats(spark, sf0001)
      .withColumn("start_off", sum("n_tok").over(w) - col("n_tok"))
      .withColumn("seq_id", expr(s"start_off div ${Tokenize.TokenBudget}"))
    val seqs = packed.groupBy("source", "seq_id")
      .agg(sum("n_tok").as("stok"), max_by(col("n_tok"), col("doc_id")).as("lt"),
        count(lit(1)).as("nd"))
      .collect()
    assert(seqs.nonEmpty)
    // multi-doc sequences must exist at gate scale or the budget pins nothing
    assert(seqs.exists(_.getLong(4) > 1), "no multi-doc sequence — budget irrelevant")
    seqs.foreach { r =>
      assert(r.getLong(2) - r.getLong(3) < Tokenize.TokenBudget,
        s"seq (${r.getString(0)}, ${r.getLong(1)}) holds ${r.getLong(2)} tokens " +
          s"beyond its straddler")
    }
  }

  test("gates return their invariant zeros (the shape the oracle checks)") {
    val t16b = graft.SparkEntry.queries("t16b_token_pack")(spark, sf0001).head()
    assert(t16b.getLong(0) == 0L && t16b.getLong(1) == 0L && t16b.getLong(2) > 0L)
    val t24b = graft.SparkEntry.queries("t24b_token_vocab")(spark, sf0001).head()
    assert(t24b.getLong(1) == 0L && t24b.getLong(2) > 0L && t24b.getLong(0) > 0L)
  }

  test("t16b/t24b hold under an IMPORTED published vocabulary") {
    // the committed GPT-2-format artifact replaces corpus training
    // (GRAFT_BPE_MERGES / GRAFT_BPE_VOCAB): token budgets become the
    // model's units, and t24b's tiling identity — being tokenizer-
    // independent — gates the import for free
    def res(n: String) = getClass.getResource(s"/bpe/$n").getPath
    System.setProperty("graft.bpe.merges", res("mini_merges.txt"))
    System.setProperty("graft.bpe.vocab", res("mini_vocab.json"))
    Tokenize.clearCaches(spark)
    try {
      val e = Tokenize.encoderFor(spark, sf0001)
      assert(e.vocabSize == 312 && e.publishedIds != null,
        "imported artifact not in effect")
      val t16b = graft.SparkEntry.queries("t16b_token_pack")(spark, sf0001).head()
      assert(t16b.getLong(0) == 0L && t16b.getLong(1) == 0L && t16b.getLong(2) > 0L)
      val t24b = graft.SparkEntry.queries("t24b_token_vocab")(spark, sf0001).head()
      val rawBytes = Tables.documents(spark, sf0001)
        .agg(sum(octet_length(col("text")))).head().getLong(0)
      assert(t24b.getLong(0) == rawBytes,
        s"tiling identity broke under import: ${t24b.getLong(0)} != $rawBytes")
      assert(t24b.getLong(1) == 0L, "vocab violations under the imported size")
    } finally {
      System.clearProperty("graft.bpe.merges")
      System.clearProperty("graft.bpe.vocab")
      Tokenize.clearCaches(spark)
    }
  }
}
