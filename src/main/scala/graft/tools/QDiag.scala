package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query job/stage/task accounting: run each named query 3×, printing
  * wall seconds, job + stage counts and summed task metrics per run, plus
  * any stage above 2 s of task time. The warm runs isolate structural
  * overhead (many tiny jobs) from real compute.
  *
  * Usage: runMain graft.tools.QDiag <sfDir> <query...>
  */
object QDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong()
    val stages = new java.util.concurrent.atomic.AtomicLong()
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
        override def onStageCompleted(
            st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          val ms = st.stageInfo.taskMetrics.executorRunTime
          taskMs.addAndGet(ms)
          if (ms > 2000 && sys.env.contains("GRAFT_QDIAG_STAGES"))
            println(f"[qdiag-stage] run=${ms / 1e3}%.1fs " +
              f"tasks=${st.stageInfo.numTasks} " +
              st.stageInfo.rddInfos.map(_.name).mkString("|").take(200))
          ()
        }
      })
    for (n <- names; i <- 1 to 3) {
      val (j0, s0, m0) = (jobs.get(), stages.get(), taskMs.get())
      val t0 = System.nanoTime()
      val cnt = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[qdiag] $n run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs " +
        f"rows=$cnt jobs=${jobs.get() - j0} stages=${stages.get() - s0} " +
        f"taskSec=${(taskMs.get() - m0) / 1e3}%.2f")
    }
    spark.stop()
  }
}
