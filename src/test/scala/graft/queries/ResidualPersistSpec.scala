package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The residual-PQ tier as a PERSISTED index family (VERDICT r18 next
  * #1): the encoding the engine declares production-grade for clustered
  * geometry must outlive the JVM — r18 memoized the trained state per
  * session only, so every serving restart re-paid two Lloyd trainings
  * and a second process could not share the tier at all. Pins: the
  * artifacts land on disk once; a reopen (session memo dropped) loads
  * without retraining; a GENUINE second process serves with zero
  * trainings; staged inserts encode residuals against the frozen
  * centroids + codebook at insert time; and a flush drains the residual
  * staging into per-cell code files without re-encoding.
  */
class ResidualPersistSpec extends SparkSuite {

  private def freshRoot(nVec: Int, nCells: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-resid-idx").toString
    Vectors.buildIvfIndex(RoutingFixtures.vectors(spark, nVec, nCells), dir)
    dir
  }

  private def rm(dir: String): Unit =
    graft.engine.MultiAnalyzer.deleteRecursively(new java.io.File(dir))

  test("artifacts persist; reopen after dropping the session memo does not retrain") {
    val root = freshRoot(nVec = 512, nCells = 16)
    try {
      val t0 = Vectors.residualTrains.get()
      val (_, nCells, codes, _, cbRows) = Vectors.residualPqOpen(spark, root)
      assert(Vectors.residualTrains.get() == t0 + 1, "first open must train")
      assert(nCells == 16 && cbRows.nonEmpty)
      val n1 = codes.count()
      assert(n1 == 512)
      for (a <- Seq("residual/_TIER_COMPLETE", "residual/centroids",
          "residual/codebook", "residual/codes"))
        assert(new java.io.File(s"$root/$a").exists(), s"missing artifact $a")
      // drop the session memo (what a restart loses) and reopen through
      // an ALIASED spelling — one canonical entry, zero retraining
      Vectors.invalidateResidualSession(spark, root)
      val (_, _, codes2, _, _) = Vectors.residualPqOpen(spark, root + "/")
      assert(codes2.count() == n1)
      assert(Vectors.residualTrains.get() == t0 + 1,
        "reopen retrained despite persisted artifacts")
      Vectors.invalidateResidualSession(spark, root)
    } finally rm(root)
  }

  test("a second PROCESS serves from the persisted tier without retraining") {
    val classes = new java.io.File("target/scala-2.13/classes")
    assume(classes.isDirectory, "compiled classes dir absent")
    val root = freshRoot(nVec = 256, nCells = 8)
    try {
      Vectors.residualPqOpen(spark, root) // builds + persists the tier
      Vectors.invalidateResidualSession(spark, root)
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar"
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val cmd = (Seq("java") ++ addOpens ++ Seq(
        "-Dspark.ui.enabled=false", "-Xmx2g",
        "-cp", s"${classes.getAbsolutePath}:/opt/spark/jars/*",
        "graft.tools.ResidualServeProbe", root)).toArray
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        "serve probe did not finish")
      assert(p.exitValue() == 0, s"serve probe failed:\n$out")
      val line = out.linesIterator.find(_.startsWith("residual_serve"))
        .getOrElse(fail(s"no probe line in output:\n$out"))
      assert(line.contains("trains=0"),
        s"second process RETRAINED instead of loading the artifacts: $line")
      assert(line.contains("code_rows=256"), s"unexpected code table: $line")
      val probeRows = "probe_rows=(\\d+)".r.findFirstMatchIn(line)
        .map(_.group(1).toLong).getOrElse(0L)
      assert(probeRows > 0, s"second process served nothing: $line")
    } finally rm(root)
  }

  test("staged inserts encode residuals at insert time; flush drains without re-encoding") {
    val emb = RoutingFixtures.vectors(spark, 600, 16)
    val base = emb.filter(col("vec_id") % 5 =!= 3)
    val delta = emb.filter(col("vec_id") % 5 === 3)
    val root = java.nio.file.Files.createTempDirectory("graft-resid-maint").toString
    try {
      Vectors.buildIvfIndex(base, root)
      Vectors.residualPqOpen(spark, root) // freeze centroids + codebook on base
      val nBase = base.count()
      val nDelta = delta.count()
      // route the delta against the FROZEN base quantizer (FAISS add())
      val cent = spark.read.parquet(s"$root/centroids")
      val routed = Vectors.routeQueries(
          delta.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
          cent, cent.count())
        .withColumnRenamed("q_id", "vec_id")
      val rows = delta
        .withColumn("nrm", expr("sqrt(array_dot(embedding, embedding))"))
        .join(routed, "vec_id")
        .select("vec_id", "label", "embedding", "nrm", "cell")
      val cbBytes = java.nio.file.Files.readAllBytes(
        new java.io.File(s"$root/residual/codebook").listFiles()
          .filter(_.getName.endsWith(".parquet")).head.toPath)
      Vectors.stageInsert(spark, root, rows)
      // frozen state untouched by the insert (assignment-only)
      val cbBytes2 = java.nio.file.Files.readAllBytes(
        new java.io.File(s"$root/residual/codebook").listFiles()
          .filter(_.getName.endsWith(".parquet")).head.toPath)
      assert(java.util.Arrays.equals(cbBytes, cbBytes2),
        "stageInsert rewrote the frozen residual codebook")
      val staged = Vectors.residualStagedCodes(spark, root)
        .getOrElse(fail("no residual codes staged"))
      assert(staged.count() == nDelta)
      // SERVING sees the staged inserts pre-flush: the index ∪ staging
      // union (same contract as raw v13/s12 serving)
      assert(Vectors.residualServingCodes(spark, root).count() == nBase + nDelta,
        "residual serving union missed staged codes")
      // at-insert-time codes == the frozen encoder applied now: a drifted
      // codebook, a re-route, or a missed subtraction all break this
      val expect = Vectors.encodeResidual(
        spark, root, rows.select("vec_id", "embedding", "cell"))
      assert(staged.join(expect, Seq("vec_id", "cell", "carr"), "left_anti")
        .count() == 0, "staged residual codes drifted from the frozen encoding")
      val stagedPick = staged.orderBy("vec_id").limit(3)
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
      // flush everything: residual staging drains to per-cell code files
      assert(Vectors.flushStaging(spark, root, blockBytes = 1L) > 0)
      // drained: the swapped-in remainder is a zero-row table (the raw
      // side's post-drain shape too — an empty parquet part survives)
      assert(Vectors.residualStagedCodes(spark, root).forall(_.count() == 0),
        "residual staging did not drain with the raw flush")
      // the flush invalidated the session memo itself: the serving
      // union stays complete with NO manual invalidation
      assert(Vectors.residualServingCodes(spark, root).count() == nBase + nDelta,
        "post-flush serving union stale (memo not invalidated by flush)")
      val codesAfter = spark.read.parquet(s"$root/residual/codes")
      assert(codesAfter.count() == nBase + nDelta,
        "flushed residual codes lost or duplicated rows")
      // moved, not re-encoded: the flushed rows carry identical codes
      val after = codesAfter
        .filter(col("vec_id").isin(stagedPick.map(_._1): _*))
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
      assert(after == stagedPick, "flush re-encoded or reordered codes")
    } finally rm(root)
  }

  test("residual code cells compact under the root lock; codes survive byte-identical") {
    // each flush appends one file per flushed cell to residual/codes —
    // over many insert/flush cycles the per-cell file count grows like
    // the raw side's, and the SAME compaction machinery folds it back
    // (with the lock taken on the INDEX ROOT, so it serializes with
    // flushes — the default parent-derived lock would be $root/residual,
    // which no flush holds)
    val emb = RoutingFixtures.vectors(spark, 640, 8)
    val base = emb.filter(col("vec_id") % 8 < 5)
    val root = java.nio.file.Files.createTempDirectory("graft-resid-compact").toString
    try {
      Vectors.buildIvfIndex(base, root)
      Vectors.residualPqOpen(spark, root)
      val cent = spark.read.parquet(s"$root/centroids")
      def insertAndFlush(m: Int): Unit = {
        val d = emb.filter(col("vec_id") % 8 === m)
        val routed = Vectors.routeQueries(
            d.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
            cent, cent.count())
          .withColumnRenamed("q_id", "vec_id")
        Vectors.stageInsert(spark, root,
          d.withColumn("nrm", expr("sqrt(array_dot(embedding, embedding))"))
            .join(routed, "vec_id")
            .select("vec_id", "label", "embedding", "nrm", "cell"))
        assert(Vectors.flushStaging(spark, root, blockBytes = 1L) > 0)
      }
      Seq(5, 6, 7).foreach(insertAndFlush)
      val codesDir = new java.io.File(s"$root/residual/codes")
      def maxFilesPerCell: Int = codesDir.listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(_.listFiles().count(_.getName.endsWith(".parquet"))).max
      assert(maxFilesPerCell >= 3,
        s"fixture did not accumulate appended code files ($maxFilesPerCell)")
      val before = spark.read.parquet(s"$root/residual/codes")
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1).toSeq
      assert(Vectors.compactCells(spark, s"$root/residual/codes",
        maxFiles = 1, lockRoot = Some(root)) > 0)
      assert(maxFilesPerCell == 1, "compaction left multi-file code cells")
      val after = spark.read.parquet(s"$root/residual/codes")
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1).toSeq
      assert(after == before, "compaction changed the residual codes")
      Vectors.invalidateResidualSession(spark, root)
      assert(Vectors.residualServingCodes(spark, root).count() == emb.count())
    } finally rm(root)
  }

  test("a crash between stageInsert's raw and residual appends heals at flush") {
    // stageInsert writes the raw staging row, then its residual codes;
    // a crash between the two leaves a raw-staged row with no residual
    // twin. flushStaging's reconcile encodes the missing rows before
    // draining — simulate the crash by deleting residual/staging after
    // a normal insert.
    val emb = RoutingFixtures.vectors(spark, 300, 8)
    val base = emb.filter(col("vec_id") % 5 =!= 2)
    val delta = emb.filter(col("vec_id") % 5 === 2)
    val root = java.nio.file.Files.createTempDirectory("graft-resid-crash").toString
    try {
      Vectors.buildIvfIndex(base, root)
      Vectors.residualPqOpen(spark, root)
      val cent = spark.read.parquet(s"$root/centroids")
      val routed = Vectors.routeQueries(
          delta.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
          cent, cent.count())
        .withColumnRenamed("q_id", "vec_id")
      Vectors.stageInsert(spark, root,
        delta.withColumn("nrm", expr("sqrt(array_dot(embedding, embedding))"))
          .join(routed, "vec_id")
          .select("vec_id", "label", "embedding", "nrm", "cell"))
      // the simulated crash: the residual half of the insert is lost
      graft.engine.MultiAnalyzer.deleteRecursively(
        new java.io.File(s"$root/residual/staging"))
      assert(Vectors.residualStagedCodes(spark, root).isEmpty)
      assert(Vectors.flushStaging(spark, root, blockBytes = 1L) > 0)
      Vectors.invalidateResidualSession(spark, root)
      assert(spark.read.parquet(s"$root/residual/codes").count() == emb.count(),
        "flush did not reconcile the crash-lost residual codes")
    } finally rm(root)
  }

  test("recovery completes a flush that crashed after the commit, residual side included") {
    // crash point: AFTER the commit rename (staging -> _staging_old),
    // BEFORE completeFlush ran at all — _flush_out/_staging_new and the
    // residual twins all sit pre-move. recoverFlush (run by the next
    // maintenance entry) must finish BOTH sides idempotently.
    val emb = RoutingFixtures.vectors(spark, 300, 8)
    val base = emb.filter(col("vec_id") % 5 =!= 2)
    val delta = emb.filter(col("vec_id") % 5 === 2)
    val root = java.nio.file.Files.createTempDirectory("graft-resid-crash2").toString
    try {
      Vectors.buildIvfIndex(base, root)
      Vectors.residualPqOpen(spark, root)
      val cent = spark.read.parquet(s"$root/centroids")
      val routed = Vectors.routeQueries(
          delta.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
          cent, cent.count())
        .withColumnRenamed("q_id", "vec_id")
      Vectors.stageInsert(spark, root,
        delta.withColumn("nrm", expr("sqrt(array_dot(embedding, embedding))"))
          .join(routed, "vec_id")
          .select("vec_id", "label", "embedding", "nrm", "cell"))
      // reconstruct the exact post-commit crash state by hand: run the
      // pre-commit writes + the commit rename, skip completeFlush
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val st = spark.read.parquet(s"$root/staging")
      val allCells = st.select("cell").distinct()
      st.join(broadcast(allCells), Seq("cell"), "left_semi")
        .repartition(col("cell"))
        .write.partitionBy("cell").mode("overwrite").parquet(s"$root/_flush_out")
      st.join(broadcast(allCells), Seq("cell"), "left_anti")
        .write.mode("overwrite").parquet(s"$root/_staging_new")
      val rst = spark.read.parquet(s"$root/residual/staging")
      rst.join(broadcast(allCells), Seq("cell"), "left_semi")
        .repartition(col("cell"))
        .write.partitionBy("cell").mode("overwrite")
        .parquet(s"$root/_flush_out_resid")
      rst.join(broadcast(allCells), Seq("cell"), "left_anti")
        .write.mode("overwrite").parquet(s"$root/_staging_new_resid")
      assert(fs.rename(new org.apache.hadoop.fs.Path(s"$root/staging"),
        new org.apache.hadoop.fs.Path(s"$root/_staging_old")))
      // "crash" — next maintenance op runs recovery
      Vectors.recoverFlush(spark, root)
      for (t <- Seq("_flush_out", "_staging_new", "_flush_out_resid",
          "_staging_new_resid", "_staging_old", "_rstaging_old"))
        assert(!new java.io.File(s"$root/$t").exists(), s"recovery left $t")
      Vectors.invalidateResidualSession(spark, root)
      assert(spark.read.parquet(s"$root/vectors").count() == emb.count())
      assert(spark.read.parquet(s"$root/residual/codes").count() == emb.count(),
        "recovery lost residual codes")
      assert(Vectors.residualStagedCodes(spark, root).forall(_.count() == 0))
    } finally rm(root)
  }

  test("rows staged BEFORE the tier exists still reach residual/codes") {
    // the ordering hole a review caught: stageInsert skips residual
    // encoding when no tier exists; the tier build then trained from
    // vectors/ only and the flush's residual twin no-op'd — those rows
    // were permanently missing from residual search. Now the tier build
    // encodes live staging, and the flush reconciles any remainder.
    val emb = RoutingFixtures.vectors(spark, 400, 8)
    val base = emb.filter(col("vec_id") % 4 =!= 1)
    val delta = emb.filter(col("vec_id") % 4 === 1)
    val root = java.nio.file.Files.createTempDirectory("graft-resid-order").toString
    try {
      Vectors.buildIvfIndex(base, root)
      val cent = spark.read.parquet(s"$root/centroids")
      val routed = Vectors.routeQueries(
          delta.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
          cent, cent.count())
        .withColumnRenamed("q_id", "vec_id")
      val rows = delta
        .withColumn("nrm", expr("sqrt(array_dot(embedding, embedding))"))
        .join(routed, "vec_id")
        .select("vec_id", "label", "embedding", "nrm", "cell")
      // stage FIRST — no residual tier exists yet
      Vectors.stageInsert(spark, root, rows)
      assert(!Vectors.hasResidualTier(spark, root))
      // tier build encodes the live staging it finds
      Vectors.residualPqOpen(spark, root)
      val staged = Vectors.residualStagedCodes(spark, root)
        .map(_.count()).getOrElse(0L)
      assert(staged == delta.count(),
        s"tier build did not encode pre-existing staged rows ($staged)")
      assert(Vectors.residualServingCodes(spark, root).count() == emb.count())
      // and the flush lands them in the persisted family
      assert(Vectors.flushStaging(spark, root, blockBytes = 1L) > 0)
      assert(spark.read.parquet(s"$root/residual/codes").count() == emb.count(),
        "pre-tier staged rows missing from residual/codes after flush")
    } finally rm(root)
  }
}
