package graft.tools

import graft.queries.{Lsh, Text, Vectors}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** LSH saturation profile at real table scale: on a GenScale dir, measure
  * the auto band-depth heuristics (Text.autoRowsPerBand over the
  * documents shingles, Vectors.autoPlanesPerBand over the embeddings)
  * against the shallow oracle-locked defaults — max bucket size, rows
  * dropped by the occupancy cap, and wall time per depth. The x100/x1000
  * rows extend the 20k/50k AutoDepthSpec evidence to the scales where
  * BASELINE.md documented chance-collision saturation.
  *
  * Residual drops at the auto depth split two ways: chance collisions
  * shrink when the sweep deepens further; true near-duplicate clusters
  * share identical signatures at EVERY depth (deepening cannot split
  * them — the occupancy cap bounding their quadratic explode, with
  * observed drop counts, is the designed behavior).
  *
  * Usage: runMain graft.tools.LshScaleProfile <scaleDir> [text|vec|both]
  * [sample=F] [depth…] — sample=F chooses the depth on a deterministic
  * F-fraction sample (the 100 TB protocol) while the per-depth bucket
  * stats below it always run on the FULL corpus, verifying the sampled
  * choice; extra depths join the shallow-default + auto sweep.
  */
object LshScaleProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val mode = args.lift(1).getOrElse("both")
    val rest = args.drop(2)
    val sample = rest.collectFirst {
      case a if a.startsWith("sample=") => a.stripPrefix("sample=").toDouble
    }.getOrElse(1.0)
    // sweep=auto: verify only the auto-chosen depth (each full-corpus
    // bucket stat keeps its shuffle files for the app's lifetime, so at
    // x1000 one process per depth avoids accumulating ~50 GB of spill)
    val autoOnly = rest.contains("sweep=auto")
    val extraDepths = rest.filterNot(a =>
      a.startsWith("sample=") || a == "sweep=auto").map(_.toInt).toSeq
    def sweep(shallow: Int, auto: Int): Seq[Int] =
      (if (autoOnly) Seq(auto) else Seq(shallow, auto) ++ extraDepths)
        .distinct.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def bucketStats(buckets: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val r = buckets
        .groupBy("band", "bkey").agg(count(lit(1)).as("cnt"))
        .agg(max("cnt").as("max_bucket"),
          sum(greatest(col("cnt") - Lsh.DefaultBucketCap, lit(0))).as("dropped"),
          count(lit(1)).as("buckets"))
        .head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    if (mode != "vec") {
      // NOT persisted: the exploded shingle frame is ~150× the parquet
      // scan it comes from — at x1000 caching it spills tens of GB to
      // disk while recomputing it is a cheap map-side explode
      val sh = Text.shingles(spark, dir, 3)
      val nDocs = sh.select("doc_id").distinct().count()
      val (auto, tAuto) = timed(Text.autoRowsPerBand(sh, sample = sample))
      println(f"[lsh] text docs=$nDocs auto_depth=$auto " +
        f"(measured, sample=$sample%.2f, chose in $tAuto%.1fs)")
      for (depth <- sweep(2, auto)) {
        val ((mx, drop, nb), t) =
          timed(bucketStats(Text.lshBuckets(sh, bands = 4, rowsPerBand = depth)))
        println(f"[lsh] text depth=$depth max_bucket=$mx dropped=$drop " +
          f"buckets=$nb time=$t%.1fs")
      }
    }

    if (mode != "text") {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val nVecs = emb.count()
      val analytic = Vectors.autoPlanesPerBand(nVecs)
      val (auto, tAuto) = timed(Vectors.autoPlanesPerBand(
        emb, nVecs, Lsh.DefaultTargetOccupancy, bands = 4, sample = sample))
      println(f"[lsh] vec n=$nVecs auto_planes=$auto " +
        f"(measured, sample=$sample%.2f; analytic=$analytic, chose in $tAuto%.1fs)")
      for (depth <- sweep(8, auto)) {
        val ((mx, drop, nb), t) =
          timed(bucketStats(Vectors.lshSignatures(emb, bands = 4, planesPerBand = depth)))
        println(f"[lsh] vec depth=$depth max_bucket=$mx dropped=$drop " +
          f"buckets=$nb time=$t%.1fs")
      }
    }
    spark.stop()
  }
}
