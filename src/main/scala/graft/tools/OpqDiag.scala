package graft.tools

import org.apache.spark.sql.SparkSession

/** Time the pieces of v21's warm path separately: opqFor memo hit,
  * driver-side invariant arithmetic, and the distributed roundtrip
  * count — to localize which piece carries the warm wall.
  *
  * Usage: runMain graft.tools.OpqDiag <sfDir>
  */
object OpqDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = st.stageInfo
          val wall = (for (a <- i.completionTime; b <- i.submissionTime)
            yield (a - b) / 1e3).getOrElse(-1.0)
          println(f"[opqdiag-stage] id=${i.stageId} tasks=${i.numTasks} " +
            f"wall=$wall%.2fs taskSec=${i.taskMetrics.executorRunTime / 1e3}%.2f " +
            i.name.take(80))
          ()
        }
      })
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[opqdiag] $label: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    for (i <- 1 to 3) {
      println(s"== pass $i ==")
      val res = t("opqFor")(graft.queries.Vectors.opqFor(spark, dir))
      t("orthDefect")(graft.queries.Opq.orthDefect(res.r))
      t("objectives")(res.objectives.sliding(2).count {
        case Seq(a, b) => b > a + 1e-9 * math.max(1.0, a)
        case _ => false
      })
      t("rt-count")(graft.queries.Vectors.opqRoundtripViolationsForDiag(spark, dir, res))
      t("full-gate")(graft.SparkEntry.queries("v21_opq_invariants")(spark, dir).count())
    }
    spark.stop()
  }
}
