package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage cost of the shingle pipelines behind t5/t19 — the two
  * bench queries that dominate the round-17 window. Times each prefix of
  * the t5 plan (tokenize → n-gram transform → explode → distinct →
  * md5 → fingerprint agg) by forcing full materialization (toRdd.count),
  * so the increment between lines is that stage's cost.
  *
  * Usage: runMain graft.tools.ShingleDiag <sfDir> [n]
  */
object ShingleDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def force(tag: String, df: DataFrame): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val c = df.queryExecution.toRdd.count()
        println(f"[shdiag] $tag%-22s run$i ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$c")
      }
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    force("scan", docs.select("doc_id", "text"))
    val toks = docs.select(col("doc_id"), split(lower(col("text")), " ").as("ts"))
    force("tokenize", toks)
    val parts = (0 until n).map(k => s"element_at(ts, i+$k)").mkString(", ")
    val arr = toks
      .filter(size(col("ts")) >= n)
      .selectExpr("doc_id",
        s"transform(sequence(1, size(ts)-${n - 1}), i -> concat_ws(' ', $parts)) AS sh")
    force("ngram arrays", arr)
    val ex = arr.select(col("doc_id"), explode(col("sh")).as("shingle"))
    force("explode", ex)
    force("distinct", ex.distinct())
    force("md5", ex.distinct().select(col("doc_id"), md5(col("shingle")).as("h")))
    force("fingerprint agg", ex.distinct()
      .select(col("doc_id"), md5(col("shingle")).as("h"))
      .groupBy("doc_id")
      .agg(min("h").as("fp_min"),
        array_join(slice(sort_array(collect_list(col("h"))), 1, 3), ",").as("fp_kmin")))
    // the distinct-free array form for comparison: per-row distinct + agg
    val rowForm = toks
      .filter(size(col("ts")) >= n)
      .selectExpr("doc_id",
        s"array_distinct(transform(sequence(1, size(ts)-${n - 1}), i -> concat_ws(' ', $parts))) AS sh")
      .selectExpr("doc_id", "transform(sh, x -> md5(x)) AS hs")
      .selectExpr("doc_id", "array_min(hs) AS fp_min",
        "array_join(slice(array_sort(hs), 1, 3), ',') AS fp_kmin")
    force("row-form fingerprint", rowForm)
    // isolate the Generate: explode over PERSISTED arrays (no transform
    // recompute possible), and explode of a same-size int sequence
    val cached = arr.persist()
    cached.count()
    force("explode cached arr", cached.select(col("doc_id"), explode(col("sh")).as("shingle")))
    cached.unpersist()
    force("explode int seq", toks.filter(size(col("ts")) >= n)
      .selectExpr("doc_id", s"explode(sequence(1, size(ts)-${n - 1})) AS i"))
    force("explode + len only", arr.select(col("doc_id"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"), length(col("shingle")).as("l")))
    spark.stop()
  }
}
