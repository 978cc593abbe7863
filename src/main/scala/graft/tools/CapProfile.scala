package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off: t22's per-source cap via the bounded `topk_by` partial
  * aggregate vs the rank-window form it replaces, at GenScale sizes,
  * with per-form shuffle-write rows/bytes. Finding (recorded in
  * BASELINE.md): Spark 4's WindowGroupLimit bounds the window form's
  * SHUFFLE to the same ~tasks×sources×25 rows as the aggregate — the
  * forms differ in map-side work, where the window fully sorts every
  * partition (twice) and topk_by does an O(k)-state insertion walk.
  */
object CapProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    def base = graft.Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        ((col("doc_id") * lit(2654435761L)) % 1000000L).cast("double").as("u"))
    def aggForm = base
      .groupBy("source").agg(expr("topk_by(u, doc_id, 25)").as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("pos", "t")))
    def windowForm = {
      val w = Window.partitionBy("source").orderBy(col("u"), col("doc_id"))
      base.withColumn("rk", row_number().over(w)).filter(col("rk") <= 25)
    }
    // shuffle volume is the 100 TB-relevant metric (local wall time is
    // scan-dominated): count shuffle-write records/bytes per execution
    val shufRecs = new java.util.concurrent.atomic.AtomicLong()
    val shufBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shufRecs.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
        shufBytes.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten): Unit
      }
    })
    def measured(f: => Long): (Long, Double, Long, Long) = {
      shufRecs.set(0); shufBytes.set(0)
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let stage-completed events drain
      (n, sec, shufRecs.get(), shufBytes.get())
    }
    for (i <- 1 to 3) {
      val (na, ta, ra, ba) = measured(aggForm.count())
      val (nw, tw, rw, bw) = measured(windowForm.count())
      println(f"""{"run":$i,"rows_agg":$na,"rows_window":$nw,"topk_by_sec":$ta%.3f,"window_sec":$tw%.3f,"topk_by_shuffle_rows":$ra,"window_shuffle_rows":$rw,"topk_by_shuffle_bytes":$ba,"window_shuffle_bytes":$bw}""")
    }
    spark.stop()
  }
}
