package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed (hash-clustered, sorted) parquet tables: pay the shuffle on
  * the cluster key ONCE at write time, then every subsequent join or
  * aggregation on that key runs exchange-free — Spark's bucketed-scan
  * reader reports the table's `HashPartitioning` to Catalyst, so a
  * sort-merge join of two tables bucketed the same way needs no
  * `ShuffleExchange` on either side, and a `groupBy(bucketKey)` needs no
  * exchange at all.
  *
  * This is the 100 TB shape for the reference's hottest join: the spike
  * report (`(time, gid)`, billions of rows) joined to the per-circuit
  * neuron table on `gid` for every window × neuron-class extraction
  * (reference: src/blueetl/extract/spikes.py:49-66 joins report gids
  * against each neuron-class gid set; repeated per class and window). A
  * campaign cache that stores both sides bucketed by `gid` converts that
  * repeated shuffle into a one-time write cost. On a real cluster the
  * bucket count is sized so one bucket ≈ one HDFS block per final file
  * (hundreds to thousands of buckets at 100 TB); the bucket metadata
  * lives in the session catalog.
  *
  * Write detail: the frame is pre-repartitioned by the exact bucket hash
  * (`HashPartitioning` and bucket assignment both use Murmur3
  * `pmod(hash(keys), n)`), so each task holds exactly one bucket and each
  * bucket lands in ONE file. One file per bucket is what lets Spark also
  * trust the written sort order and drop the per-partition `Sort` under a
  * sort-merge join of two co-bucketed tables.
  */
object Bucketed {

  /** Write `df` as an external bucketed+sorted table at `path`,
    * registered in the session catalog as `name` (required: bucket
    * metadata travels through the catalog, not the files).
    */
  def write(df: DataFrame, name: String, path: String, buckets: Int,
      keys: Seq[String], sortCols: Seq[String] = Nil): Unit =
    writePrepared(df.repartition(buckets, keys.map(col): _*),
      name, path, buckets, keys, sortCols)

  /** [[write]] minus the repartition: for callers whose frame is ALREADY
    * hash-partitioned by `pmod(hash(keys), buckets)` (i.e. built on top
    * of `repartition(buckets, keys)` through partitioning-preserving
    * operators — window/filter/project), so a second exchange of the
    * full frame would be pure waste. The caller's partitioning contract
    * is what keeps one bucket per task and therefore ONE file per
    * bucket; a frame partitioned any other way still writes correct
    * buckets, just fragmented across files (and loses the trusted sort).
    */
  def writePrepared(df: DataFrame, name: String, path: String, buckets: Int,
      keys: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "bucket keys must be non-empty")
    val sorts = if (sortCols.isEmpty) keys else sortCols
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(name)
  }

  /** Append rows to an existing bucketed table, preserving its bucket
    * spec: rows are pre-partitioned to the exact bucket hash so each
    * task holds one bucket, and `insertInto` routes them to the
    * catalog's spec — one NEW file per (insert, bucket). The scan keeps
    * its exchange-free `HashPartitioning`; with more than one file per
    * bucket Spark no longer trusts the per-bucket sort order, so
    * co-bucketed sort-merge joins re-SORT partitions (still no
    * exchange) until a compacting rewrite restores one file per bucket.
    * NOTE `insertInto` matches columns by POSITION — `df` must have the
    * table's column order.
    */
  def append(df: DataFrame, name: String, buckets: Int, keys: Seq[String]): Unit =
    appendPrepared(df.repartition(buckets, keys.map(col): _*), name)

  /** [[append]] minus the repartition — same caller contract as
    * [[writePrepared]]: the frame already carries the table's exact
    * bucket partitioning (e.g. [[graft.queries.Text.cappedDelta]]'s
    * output, whose occupancy window and left join both preserve the
    * repartition they ride), so re-exchanging it before the insert
    * would double the delta's shuffle for nothing.
    */
  def appendPrepared(df: DataFrame, name: String): Unit =
    df.write.mode("append").insertInto(name)

  /** The bucketed table as a DataFrame (catalog-backed scan — this is
    * what carries the bucket spec into the plan; a plain
    * `read.parquet(path)` of the same files would NOT).
    */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Re-attach an existing on-disk bucketed store in a session whose
    * catalog doesn't know it (bucket metadata lives in the catalog, not
    * the parquet files — a cross-session cache reload MUST re-register or
    * it silently degrades to an unbucketed scan that shuffles again).
    * `schema` must be the schema the store was written with.
    */
  def register(spark: SparkSession, name: String, path: String, buckets: Int,
      keys: Seq[String], schema: org.apache.spark.sql.types.StructType,
      sortCols: Seq[String] = Nil): DataFrame = {
    // the path lands inside a SQL string literal — a quote would break the
    // DDL (and is an injection surface for config-supplied cache roots)
    require(!path.contains("'"), s"bucketed store path must not contain ': $path")
    val sorts = if (sortCols.isEmpty) keys else sortCols
    // a stale same-name catalog entry (out-of-band rebuild, long-lived
    // session, shared metastore) can carry a DIFFERENT bucket spec than
    // the files now on disk — Spark trusts the catalog's bucket count per
    // filename, so serving it would silently drop join rows. Validate and
    // drop+recreate on any drift; DROP of an external table leaves files.
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(name)
    val catalog = spark.sessionState.catalog
    if (catalog.tableExists(ident)) {
      val meta = catalog.getTableMetadata(ident)
      val sameSpec = meta.bucketSpec.exists(bs =>
        bs.numBuckets == buckets && bs.bucketColumnNames == keys &&
          bs.sortColumnNames == sorts)
      // non-file location schemes (hdfs/s3 in a shared metastore) make the
      // File conversion throw — treat any unconvertible location as drifted
      // rather than erroring the re-register
      val samePath = meta.storage.locationUri.exists { u =>
        try new java.io.File(u).getCanonicalPath ==
          new java.io.File(path).getCanonicalPath
        catch { case _: IllegalArgumentException => false }
      }
      if (!sameSpec || !samePath)
        spark.sql(s"DROP TABLE IF EXISTS `$name`")
    }
    val cols = schema.fields
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS `$name` ($cols) USING PARQUET
         |CLUSTERED BY (${keys.map(k => s"`$k`").mkString(", ")})
         |SORTED BY (${sorts.map(k => s"`$k`").mkString(", ")})
         |INTO $buckets BUCKETS
         |LOCATION '$path'""".stripMargin)
    spark.table(name)
  }

  /** True if the frame's executed plan moves rows through any shuffle
    * exchange — the property bucketed co-location removes. Checked on the
    * rendered `executedPlan` tree (post-`EnsureRequirements`, where
    * exchanges are actually inserted; `sparkPlan` would be trivially
    * exchange-free, and under AQE the `AdaptiveSparkPlanExec` wrapper
    * hides the inner tree from `collect`).
    */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.linesIterator
      .exists(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))

  /** Number of shuffle-exchange nodes in the frame's executed plan
    * (rendered-tree count, same caveats as [[hasShuffle]]). Used to
    * REQUIRE that joining a small delta against a bucketed store adds
    * ZERO exchanges beyond the delta side's own: the plan of
    * `delta ⋈ bucketedStore` must count exactly what the prepared delta
    * subplan counts alone — the store side reads exchange-free.
    */
  def shuffleCount(df: DataFrame): Int =
    df.queryExecution.executedPlan.toString.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))

  /** Shuffle exchanges OUTSIDE broadcast subtrees — the STREAM-side
    * shuffle count of a stream-static join plan. Everything under a
    * `BroadcastExchange` is the static side (built once per micro-batch,
    * free to aggregate/shuffle); any shuffle elsewhere moves STREAM rows,
    * which breaks append-mode legality. Tree walk, not string match:
    * the static side's exchanges must not count against the stream.
    */
  def streamSideShuffles(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, BroadcastQueryStageExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{
      BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}
    def walk(p: SparkPlan): Int = p match {
      case _: BroadcastExchangeLike => 0
      case e: ShuffleExchangeLike => 1 + e.children.map(walk).sum
      case r: ReusedExchangeExec => walk(r.child)
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      // AQE materializes exchanges into QueryStageExec LEAVES (children
      // is Nil) — an executed adaptive plan walked without unwrapping
      // counts 0 and passes the map-only REQUIREs vacuously. Unwrap to
      // the held exchange: a broadcast stage is static-side (stop), any
      // other stage's plan is the shuffle subtree (counted by the
      // ShuffleExchangeLike case above).
      case b: BroadcastQueryStageExec => 0
      case q: QueryStageExec => walk(q.plan)
      case other => other.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }
}
