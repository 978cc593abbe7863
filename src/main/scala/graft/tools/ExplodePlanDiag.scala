package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ExplodePlanDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val ex = graft.queries.Text.explodedWithNsForTesting(docs)
    val plan = ex.queryExecution.executedPlan.toString
    println("plan filter lines with transform inlined: " +
      plan.linesIterator.count(l => l.contains("Filter") ))
    println(plan.linesIterator.take(8).mkString("\n").take(1500))
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val c = ex.queryExecution.toRdd.count()
      println(f"[ewndiag] run$i ${(System.nanoTime()-t0)/1e9}%.2fs rows=$c")
    }
    spark.stop()
  }
}
