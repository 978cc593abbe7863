package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage attribution for the t28b rerank chain: time rerankAt's eager
  * scratch writes (candidates + signatures + estimate), the exact-slice
  * re-rank, and the composed release separately, warm (memoized corpus
  * state pre-built by a t28 run first).
  *
  * Usage: runMain graft.tools.T28bDiag <sfDir>
  */
object T28bDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
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
          if (ms > 2000) {
            val tm = st.stageInfo.taskMetrics
            println(f"[t28b-stage] run=${ms / 1e3}%.1fs " +
              f"cpu=${tm.executorCpuTime / 1e9}%.1fs " +
              f"deser=${tm.executorDeserializeTime / 1e3}%.1fs " +
              f"gc=${tm.jvmGCTime / 1e3}%.1fs " +
              f"fetchWait=${tm.shuffleReadMetrics.fetchWaitTime / 1e3}%.1fs " +
              f"tasks=${st.stageInfo.numTasks} " + st.stageInfo.name.take(50))
          }
          ()
        }
      })
    def t[T](tag: String)(body: => T): T = {
      val (j0, s0, m0) = (jobs.get(), stages.get(), taskMs.get())
      val t0 = System.nanoTime()
      val r = body
      println(f"[t28b-diag] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs " +
        f"jobs=${jobs.get() - j0} stages=${stages.get() - s0} " +
        f"taskSec=${(taskMs.get() - m0) / 1e3}%.2f")
      r
    }
    println("[t28b-diag] AQE=" +
      spark.conf.get("spark.sql.adaptive.enabled"))
    if (sys.env.contains("GRAFT_DIAG_COALESCE")) {
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      println("[t28b-diag] parallelismFirst=false")
    }
    // warm the memoized corpus state the bench shares (shingles, pairs,
    // t26 index) through the t28 gate
    t("t28 full (state build)") {
      graft.SparkEntry.queries("t28_pipeline")(spark, sfDir).count()
    }
    t("t28 full (warm)") {
      graft.SparkEntry.queries("t28_pipeline")(spark, sfDir).count()
    }
    for (round <- 1 to 2) {
      val (est, borderline, scored) =
        t(s"rerankAt call (cand+sigs+est writes) r$round") {
          graft.queries.Text.rerankAt(spark, sfDir, 4, 2, true)
        }
      t(s"est count r$round") { println("  est rows=" + est.count()) }
      t(s"borderline count r$round") {
        println("  borderline rows=" + borderline.count())
      }
      t(s"scored count (exact jaccard) r$round") {
        println("  scored rows=" + scored.count())
      }
      import org.apache.spark.sql.functions.col
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      if (round == 1) {
        val sh = graft.queries.Text.persistedShinglesForDiag(spark, sfDir)
        t("noop sh (IMR scan)") { noop(sh) }
        val bdocs = borderline.select(col("doc1").as("doc_id"))
          .union(borderline.select(col("doc2"))).distinct()
        t("noop bdocs") { noop(bdocs) }
        val shb = sh.join(bdocs, Seq("doc_id"), "left_semi")
        t("noop shb (sh semi bdocs)") { noop(shb) }
        import org.apache.spark.sql.functions.{count, lit}
        val n = shb.groupBy("doc_id").agg(count(lit(1)).as("ns"))
        t("noop n") { noop(n) }
        // create the dump dir first: Files.writeString does not make
        // parent directories (ADVICE r20 — NoSuchFileException on a
        // machine without /tmp/opt)
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get("/tmp/opt"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("/tmp/opt/n_plan.txt"),
          n.queryExecution.executedPlan.toString)
        val a = shb.select(col("doc_id").as("doc1"), col("shingle"))
        val b = shb.select(col("doc_id").as("doc2"), col("shingle"))
        val ic = borderline.join(a, "doc1").join(b, Seq("doc2", "shingle"))
          .groupBy("doc1", "doc2").agg(count(lit(1)).as("ic"))
        t("noop ic") { noop(ic) }
        t("noop exactJaccard") {
          noop(graft.queries.Text.exactJaccard(sh, borderline))
        }
        t("noop scored") { noop(scored) }
      }
      val losers = scored.filter(col("jaccard") >= 0.8)
        .select(col("doc2").as("doc_id")).distinct()
      t(s"losers count r$round") { println("  losers=" + losers.count()) }
      if (round == 1) {
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get("/tmp/opt"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("/tmp/opt/losers_plan.txt"),
          losers.queryExecution.executedPlan.toString)
        ()
      }
      t(s"release(losers from scored) r$round") {
        graft.queries.Text.pipelineReleaseForDiag(spark, sfDir, losers).count()
      }
      t(s"t28b full r$round") {
        graft.SparkEntry.queries("t28b_pipeline_scaled")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
