package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** t24 skew probe: does the "vocab-sized exchange" claim survive a
  * Zipfian token distribution at corpus scale?
  *
  * GenScale documents draw tokens near-uniformly from a small vocab plus
  * per-doc unique tokens — kind to an aggregate. Real corpora are
  * Zipfian: the top token is ~7% of ALL occurrences, so a naive
  * count-by-token would route a corpus-sized share of rows to one
  * reducer. The claimed defense is partial aggregation: each map task
  * combines locally, so a heavy hitter forwards at most ONE partial row
  * per map partition regardless of its frequency — reducer-side input is
  * bounded by (distinct tokens in the reducer's hash range) × partitions,
  * never by occurrence counts. This tool measures exactly that, on a
  * synthetic Zipf(1) stream (rank = floor(V^u), u hash-uniform — the
  * inverse-CDF of the log-uniform law, giving count(rank r) ∝ n/r):
  *
  *   - exchange rows: Σ over map partitions of distinct tokens present
  *     (= the map-side combine's output) vs raw occurrence rows
  *   - worst reducer: max over hash(tok)%P buckets of those partial rows
  *     (the skew the reducer actually sees)
  *   - wall seconds of the t24 aggregate shape (count + top-20) per n
  *
  * Usage: runMain graft.tools.ZipfProbe <vocab> <nTokens...>
  *   e.g. ZipfProbe 2000000 27500000 275000000  (x100- and x1000-scale
  *   token streams at a 2M vocab)
  */
object ZipfProbe {

  def main(args: Array[String]): Unit = {
    val vocab = args.head.toLong
    val ns = args.tail.map(_.toLong).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    ns.foreach { n =>
      // Zipf(1) via inverse CDF: u uniform in [0,1) from a murmur hash,
      // rank = floor(V^u) in [1, V]; token text carries the rank
      val toks = spark.range(n).select(
        concat(lit("w"), expr(
          s"cast(pow($vocab, (abs(hash(id)) % 1000000) / 1000000.0) as long)"))
          .as("tok"))

      val t0 = System.nanoTime()
      val top = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(20)
        .collect()
      val aggSec = (System.nanoTime() - t0) / 1e9
      val topShare = top.head.getLong(1).toDouble / n

      // the exchange the partial aggregate actually ships: one row per
      // (map partition, distinct token) — and its worst hash(tok)%P bucket
      val partials = toks
        .withColumn("mp", spark_partition_id())
        .groupBy("mp", "tok").agg(count(lit(1)).as("c"))
      val exch = partials.count()
      val worst = partials
        .groupBy(pmod(hash(col("tok")), lit(cpus)).as("red"))
        .agg(count(lit(1)).as("rows"))
        .agg(max("rows")).head().getLong(0)
      println(f"[zipf] n=$n%,d vocab=$vocab%,d top1_share=$topShare%.3f " +
        f"agg+top20 ${aggSec}%.1f s; exchange rows=$exch%,d " +
        f"(${exch.toDouble / n * 100}%.2f%% of occurrences), " +
        f"worst reducer=$worst%,d partial rows")
    }
    spark.stop()
  }
}
