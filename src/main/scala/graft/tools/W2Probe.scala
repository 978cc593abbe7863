package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off: w2's group index via the 5-task window vs GroupIndex.dense. */
object W2Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def g = graft.Tables.spikes(spark, dir).select("event_type", "gid").distinct()
    def windowForm = {
      val w = Window.partitionBy("event_type").orderBy("gid")
      g.withColumn("idx", (row_number().over(w) - 1).cast("long"))
    }
    def denseForm = graft.plans.GroupIndex.dense(g, Seq("event_type"), Seq("gid"))
    for (i <- 1 to 3) {
      var t0 = System.nanoTime()
      val nw = windowForm.count()
      val tw = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val nd = denseForm.count()
      val td = (System.nanoTime() - t0) / 1e9
      println(f"[w2probe] run$i window=$tw%.2fs dense=$td%.2fs rows=$nw/$nd")
    }
    spark.stop()
  }
}
