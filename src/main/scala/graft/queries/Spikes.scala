package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The blueetl analytics core re-expressed over the synthetic `events`
  * stream (time µs since origin, gid) standing in for a spike report
  * (reference data model: src/blueetl/extract/spikes.py:19).
  *
  * Covers SURVEY §2: J4 (interval/range window assignment), A1-A2
  * (by-trial aggregation + per-gid rates), A5-A7 (dense histogram, gaussian
  * smoothing with reflect boundary, extrema/argmax), A11 (ISI/CV/LV
  * spiketrain statistics), A12 (pairwise correlation of binned trains),
  * A14 (complexity PDF), A17 (onset detection), O4 (deterministic seeded
  * sampling), U1 (union by name), §2.5 window functions, plus a tumbling
  * event-time window (batch form of the streaming extension).
  *
  * Scale notes: the windows table is tiny and always broadcast, so J4 is a
  * broadcast range join with no shuffle of the big side beyond the terminal
  * aggregation; histograms aggregate to (type × bins) rows — partial
  * aggregation does the heavy lifting map-side; the pairwise correlation
  * bounds its gid set explicitly (an unbounded all-pairs corr is a
  * cartesian blowup at 100 TB — callers pick the cohort).
  */
object Spikes {

  private val H = 3600000000L // 1 hour in µs
  private val D = 24 * H
  private val Origin = Tables.EventsEpochMicros

  /** (win, trial, w_offset, t_start, t_stop) — all times µs.
    * "early" = first 12 h of days 1..3 as 3 trials (blueetl trial model:
    * offset + k*trial_step, reference src/blueetl/extract/windows.py:166-217).
    */
  private val windowRows: Seq[(String, Int, Long, Long, Long)] = Seq(
    ("early", 0, 0L, 0L, 12 * H),
    ("early", 1, D, 0L, 12 * H),
    ("early", 2, 2 * D, 0L, 12 * H),
    ("day1", 0, 0L, 0L, D),
    ("full", 0, 0L, 0L, 30 * D))

  private def windowsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    windowRows.toDF("win", "trial", "w_offset", "t_start", "t_stop")
  }

  /** J4: spikes × windows broadcast range join, time rebased to the window
    * (reference: src/blueetl/extract/spikes.py:22-29 `_assign_window`).
    */
  private def assigned(s: SparkSession, dir: String): DataFrame = {
    val sp = Tables.spikes(s, dir)
    val w = broadcast(windowsDf(s))
    sp.join(
        w,
        sp("time") >= w("w_offset") + w("t_start") &&
          sp("time") < w("w_offset") + w("t_stop"))
      .select(
        w("win"), w("trial"), sp("gid"), sp("event_type"), sp("event_id"),
        (sp("time") - w("w_offset")).as("time"))
  }

  // Shared oracle prefix: spikes view + windows VALUES + range-join CTE.
  private val winsSql = windowRows
    .map { case (w, t, o, a, b) =>
      s"('$w', $t, CAST($o AS BIGINT), CAST($a AS BIGINT), CAST($b AS BIGINT))"
    }
    .mkString(", ")

  private val cte =
    s"""WITH spikes AS (
       |  SELECT epoch_us(ts) - $Origin AS time, user_id AS gid, event_type, event_id, value
       |  FROM events),
       |wins AS (
       |  SELECT * FROM (VALUES $winsSql) AS w(win, trial, w_offset, t_start, t_stop)),
       |assigned AS (
       |  SELECT w.win, w.trial, s.gid, s.event_type, s.event_id, s.time - w.w_offset AS time
       |  FROM spikes s JOIN wins w
       |    ON s.time >= w.w_offset + w.t_start AND s.time < w.w_offset + w.t_stop)
       |""".stripMargin

  /** One oracle, two gates: w2's window form and w5's GroupIndex.dense
    * scale path must stay the SAME query — sharing the constant removes
    * the risk of the two copies drifting apart.
    */
  private val groupIndexOracle: String =
    cte +
      """, g AS (SELECT DISTINCT event_type, gid FROM spikes)
        |SELECT event_type, gid,
        |  row_number() OVER (PARTITION BY event_type ORDER BY gid) - 1 AS idx
        |FROM g""".stripMargin

  /** Dense per-event_type hourly histogram of a window as a DataFrame:
    * (event_type, bin, cnt) with empty bins filled (A5 dense fill —
    * reference: external/bnac/calculate_features.py:67-93 np.histogram).
    */
  private def denseHist(s: SparkSession, dir: String, win: String, nBins: Int): DataFrame = {
    val a = assigned(s, dir).filter(col("win") === win)
    val hist = a
      .withColumn("bin", expr(s"time div $H").cast("int"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("cnt"))
    val types = a.select("event_type").distinct()
    val bins = s.range(0, nBins).select(col("id").cast("int").as("bin"))
    types.crossJoin(broadcast(bins))
      .join(hist, Seq("event_type", "bin"), "left")
      .select(col("event_type"), col("bin"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  private def denseHistSql(win: String, nBins: Int): String =
    s"""hist AS (
       |  SELECT event_type, CAST(time // $H AS INT) AS bin, count(*) AS cnt
       |  FROM assigned WHERE win = '$win' GROUP BY 1, 2),
       |types AS (SELECT DISTINCT event_type FROM assigned WHERE win = '$win'),
       |bins AS (SELECT CAST(b AS INT) AS bin FROM generate_series(0, ${nBins - 1}) AS t(b)),
       |dense AS (
       |  SELECT t.event_type, b.bin, COALESCE(h.cnt, 0) AS cnt
       |  FROM types t CROSS JOIN bins b
       |  LEFT JOIN hist h ON h.event_type = t.event_type AND h.bin = b.bin)
       |""".stripMargin

  /** Blocked all-pairs Pearson correlation of binned spike trains — the
    * full-class scale path for A12 (reference computes the whole class's
    * correlation matrix: external/bluecv/neuron_class.py:47-49).
    *
    * Input: a (possibly sparse) `(gid, bin, cnt)` frame; absent bins count
    * as 0 over the dense grid `0 until nBins`. Output: one row per
    * unordered gid pair, `(gid1 < gid2, r)`.
    *
    * Scale design — G gids means G²/2 pairs, which must never become a
    * per-bin self-join (G² rows × nBins) or a driver-side Gram matrix
    * (G² doubles on one node). Instead:
    *   1. one shuffle assembles each gid's dense count vector + its
    *      sufficient statistics (Σx, Σx² via the codegen `array_dot`);
    *   2. gids hash into `nBlocks` blocks; the (nBlocks²/2) ordered block
    *      pairs are driver constants broadcast against the vectors, so
    *      each vector is replicated ~nBlocks times — the classic blocked
    *      cartesian, executed as two EQUI-joins (no nested loop, audited
    *      in CorrelationSpec);
    *   3. within a block pair, r comes from the closed form
    *      (n·Σxy − ΣxΣy)/√((n·Σx²−(Σx)²)(n·Σy²−(Σy)²)) with Σxy one
    *      fused `array_dot` — pure codegen per pair, no agg.
    * Memory per task is bounded by (2 · G/nBlocks · nBins) doubles: pick
    * nBlocks ≈ G·nBins·8B / (executor-task budget); bigger classes take
    * more blocks, never more per-task memory.
    */
  def pairwiseCorrelation(
      binned: DataFrame, nBins: Int, nBlocks: Int = 16,
      gidCol: String = "gid", binCol: String = "bin", cntCol: String = "cnt",
      keys: Seq[String] = Nil): DataFrame = {
    val s = binned.sparkSession
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    require(nBins > 0 && nBlocks > 0)
    val vec = binned
      .groupBy(keys.map(col) :+ col(gidCol).as("g"): _*)
      .agg(map_from_entries(collect_list(struct(
        col(binCol).cast("int"), col(cntCol).cast("double")))).as("m"))
      .select(
        keys.map(col) :+ col("g") :+
          expr(s"transform(sequence(0, ${nBins - 1}), b -> coalesce(element_at(m, b), 0D))")
            .as("v"): _*)
      .withColumn("sx", expr("aggregate(v, 0D, (acc, x) -> acc + x)"))
      .withColumn("qx", expr("array_dot(v, v)"))
      .withColumn("blk", pmod(hash(col("g")), lit(nBlocks)).cast("int"))
    val blockPairs = broadcast(
      (for { i <- 0 until nBlocks; j <- i until nBlocks } yield (i, j)).toDF("bi", "bj"))
    val a = vec.select(
      keys.map(col) :+ col("blk").as("bi") :+ col("g").as("g1") :+ col("v").as("v1") :+
        col("sx").as("s1") :+ col("qx").as("q1"): _*)
    val b = vec.select(
      keys.map(col) :+ col("blk").as("bj") :+ col("g").as("g2") :+ col("v").as("v2") :+
        col("sx").as("s2") :+ col("qx").as("q2"): _*)
    val n = lit(nBins.toDouble)
    val dot = expr("array_dot(v1, v2)")
    val cov = n * dot - col("s1") * col("s2")
    val var1 = n * col("q1") - col("s1") * col("s1")
    val var2 = n * col("q2") - col("s2") * col("s2")
    blockPairs
      .join(a, "bi")
      // group keys join with the block id: pairs form only within a group
      .join(b, "bj" +: keys)
      // {x,y} surfaces exactly once: ordered cross-block pair, or same
      // block with the gid order as the tiebreak
      .filter(col("bi") < col("bj") || col("g1") < col("g2"))
      .select(
        keys.map(col) :+
          least(col("g1"), col("g2")).as("gid1") :+
          greatest(col("g1"), col("g2")).as("gid2") :+
          when(var1 > 0 && var2 > 0, cov / sqrt(var1 * var2)).as("r"): _*)
  }

  /** Blocked all-unordered-pairs expansion of a per-gid frame — the same
    * blocking that scales A12's correlation (see [[pairwiseCorrelation]]),
    * factored out for every symmetric pairwise metric (A16 Van Rossum /
    * Victor-Purpura over whole classes; reference computes full-class
    * distance matrices in external/bluecv/comparison.py:11-21).
    *
    * gids hash into `nBlocks` blocks; the (nBlocks·(nBlocks+1)/2) ordered
    * block pairs are a broadcast driver constant, so the expansion runs as
    * two EQUI-joins (never a broadcast nested loop), each vector
    * replicated ~nBlocks times and per-task memory bounded by
    * 2·(G/nBlocks) payloads. Output: every unordered pair exactly once,
    * payload columns suffixed 1/2, normalized to gid1 < gid2.
    */
  def blockedSelfPairs(
      perGid: DataFrame, nBlocks: Int, gidCol: String = "gid",
      keys: Seq[String] = Nil): DataFrame = {
    val s = perGid.sparkSession
    import s.implicits._
    require(nBlocks > 0)
    val others = perGid.columns.filterNot(c => c == gidCol || keys.contains(c)).toSeq
    val t = perGid.withColumn("_blk", pmod(hash(col(gidCol)), lit(nBlocks)).cast("int"))
    val blockPairs = broadcast(
      (for { i <- 0 until nBlocks; j <- i until nBlocks } yield (i, j)).toDF("_bi", "_bj"))
    val a = t.select(keys.map(col) ++ (col("_blk").as("_bi") +: col(gidCol).as("_g1") +:
      others.map(c => col(c).as(s"${c}1"))): _*)
    val b = t.select(keys.map(col) ++ (col("_blk").as("_bj") +: col(gidCol).as("_g2") +:
      others.map(c => col(c).as(s"${c}2"))): _*)
    // group keys join with the block id: pairs form only within a group
    val joined = blockPairs.join(a, "_bi").join(b, "_bj" +: keys)
      // {x,y} surfaces exactly once: ordered cross-block pair, or same
      // block with the gid order as the tiebreak
      .filter(col("_bi") < col("_bj") || col("_g1") < col("_g2"))
    // cross-block pairs arrive in block order, not gid order — swap the
    // payload together with the gids to normalize to gid1 < gid2
    val swap = col("_g1") > col("_g2")
    joined.select(
      keys.map(col) ++
        (when(swap, col("_g2")).otherwise(col("_g1")).as(s"${gidCol}1") +:
          when(swap, col("_g1")).otherwise(col("_g2")).as(s"${gidCol}2") +:
          others.flatMap(c => Seq(
            when(swap, col(s"${c}2")).otherwise(col(s"${c}1")).as(s"${c}1"),
            when(swap, col(s"${c}1")).otherwise(col(s"${c}2")).as(s"${c}2")))): _*)
  }

  /** Van Rossum exponential-kernel inner product of two sorted trains as a
    * pure-codegen nested `aggregate` — O(|t1|·|t2|) per pair, no
    * intermediate arrays.
    */
  private[graft] def vrKernel(t1: String, t2: String, tau: Double): org.apache.spark.sql.Column =
    expr(s"aggregate($t1, 0D, (acc, x) -> acc + " +
      s"aggregate($t2, 0D, (a2, y) -> a2 + exp(-abs(x - y) / ${tau}D)))")

  val all: Seq[GQuery] = Seq(

    // ---- J4: interval/range join window assignment ----
    GQuery(
      "j4_window_assign",
      cte + "SELECT win, trial, gid, event_type, event_id, time FROM assigned") { (s, dir) =>
      assigned(s, dir)
    },

    // ---- A1: by-trial spike aggregation with ordered list collect
    // (reference: external/bnac/calculate_features.py:21-27) ----
    GQuery(
      "a1_spikes_by_trial",
      cte +
        """SELECT win, trial, gid, count(*) AS cnt, min(time) AS first_time,
          |  array_to_string(list(time ORDER BY time), ',') AS times
          |FROM assigned WHERE win = 'early' GROUP BY win, trial, gid""".stripMargin) { (s, dir) =>
      // times emitted as a comma-joined string: the harness cannot lexsort
      // array cells, and long→string formatting is identical in both engines.
      assigned(s, dir).filter(col("win") === "early")
        .groupBy("win", "trial", "gid")
        .agg(
          count(lit(1)).as("cnt"),
          min("time").as("first_time"),
          array_join(
            transform(sort_array(collect_list("time")), _.cast("string")),
            ",").as("times"))
    },

    // ---- A2: per-gid mean counts across trials (absent trials count 0,
    // reference: external/bnac/calculate_features.py:29-49 fillna(0).mean) ----
    GQuery(
      "a2_mean_rate_per_gid",
      cte +
        """, g AS (SELECT DISTINCT gid FROM assigned WHERE win = 'early'),
          |t AS (SELECT DISTINCT trial FROM wins WHERE win = 'early'),
          |c AS (SELECT gid, trial, count(*) AS cnt FROM assigned WHERE win = 'early' GROUP BY 1, 2)
          |SELECT g.gid, avg(COALESCE(c.cnt, 0)) AS mean_count,
          |  avg(COALESCE(c.cnt, 0)) / 43200.0 AS rate_per_sec
          |FROM g CROSS JOIN t LEFT JOIN c ON c.gid = g.gid AND c.trial = t.trial
          |GROUP BY g.gid""".stripMargin) { (s, dir) =>
      val a = assigned(s, dir).filter(col("win") === "early")
      val gids = a.select("gid").distinct()
      val trials = windowsDf(s).filter(col("win") === "early").select("trial")
      val counts = a.groupBy("gid", "trial").agg(count(lit(1)).as("cnt"))
      gids.crossJoin(broadcast(trials))
        .join(counts, Seq("gid", "trial"), "left")
        .groupBy("gid")
        .agg(avg(coalesce(col("cnt"), lit(0L))).as("mean_count"))
        .withColumn("rate_per_sec", col("mean_count") / lit(43200.0))
    },

    // ---- A5: dense PSTH histogram normalized by cohort size
    // (reference: external/bnac/calculate_features.py:67-93) ----
    GQuery(
      "a5_psth_histogram",
      cte + "," + denseHistSql("day1", 24) +
        """, ng AS (SELECT event_type, count(DISTINCT gid) AS n
          |         FROM assigned WHERE win = 'day1' GROUP BY 1)
          |SELECT d.event_type, d.bin, d.cnt, CAST(d.cnt AS DOUBLE) / ng.n AS value
          |FROM dense d JOIN ng ON ng.event_type = d.event_type""".stripMargin) { (s, dir) =>
      val a = assigned(s, dir).filter(col("win") === "day1")
      val ng = a.groupBy("event_type").agg(countDistinct("gid").as("n"))
      denseHist(s, dir, "day1", 24)
        .join(broadcast(ng), "event_type")
        .select(
          col("event_type"), col("bin"), col("cnt"),
          (col("cnt").cast("double") / col("n")).as("value"))
    },

    // ---- A6: gaussian smoothing of the dense histogram, scipy reflect
    // boundary, truncate=4σ (reference: external/bnac/calculate_features.py:82,
    // scipy.ndimage.gaussian_filter 1-D, sigma=2 here, radius=8) ----
    GQuery(
      "a6_gaussian_smooth",
      cte + "," + denseHistSql("day1", 24) +
        """, kernel AS (
          |  SELECT k, exp(-(k * k) / 8.0) / sum(exp(-(k * k) / 8.0)) OVER () AS w
          |  FROM generate_series(-8, 8) AS t(k))
          |SELECT d.event_type, d.bin,
          |  CAST(sum(src.cnt * kk.w) AS DOUBLE) AS smoothed
          |FROM dense d CROSS JOIN kernel kk
          |JOIN dense src ON src.event_type = d.event_type
          |  AND src.bin = (CASE WHEN d.bin + kk.k < 0 THEN -(d.bin + kk.k) - 1
          |                      WHEN d.bin + kk.k >= 24 THEN 47 - (d.bin + kk.k)
          |                      ELSE d.bin + kk.k END)
          |GROUP BY d.event_type, d.bin""".stripMargin) { (s, dir) =>
      val dense = denseHist(s, dir, "day1", 24)
      // kernel weights are 17 CONSTANTS — computed on the driver (same JVM
      // Math.exp and left-to-right sum the Spark plan used) instead of a
      // move-everything-to-one-partition global window
      val kernel = {
        import s.implicits._
        val ks = -8 to 8
        val w0 = ks.map(k => math.exp(-(k * k) / 8.0))
        val tot = w0.sum
        ks.zip(w0.map(_ / tot)).toDF("k", "w")
      }
      val idx = col("bin") + col("k")
      val reflect = when(idx < 0, -idx - 1).when(idx >= 24, lit(47) - idx).otherwise(idx)
      val src = dense.select(
        col("event_type").as("s_event_type"), col("bin").as("s_bin"),
        col("cnt").as("s_cnt"))
      dense.crossJoin(broadcast(kernel))
        .withColumn("src_bin", reflect)
        .join(src, col("s_event_type") === col("event_type") && col("s_bin") === col("src_bin"))
        .groupBy("event_type", "bin")
        .agg(sum(col("s_cnt") * col("w")).cast("double").as("smoothed"))
    },

    // ---- A7: histogram extrema + argmax (max_by semantics made
    // deterministic via rank; reference: bnac/calculate_features.py:79-90) ----
    GQuery(
      "a7_hist_extrema",
      cte + "," + denseHistSql("day1", 24) +
        """SELECT event_type, min(cnt) AS min_cnt, max(cnt) AS max_cnt,
          |  min(CASE WHEN rk = 1 THEN bin END) AS argmax_bin
          |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
          |                                   ORDER BY cnt DESC, bin) AS rk FROM dense)
          |GROUP BY event_type""".stripMargin) { (s, dir) =>
      val dense = denseHist(s, dir, "day1", 24)
      val w = Window.partitionBy("event_type").orderBy(col("cnt").desc, col("bin"))
      dense.withColumn("rk", row_number().over(w))
        .groupBy("event_type")
        .agg(
          min("cnt").as("min_cnt"),
          max("cnt").as("max_cnt"),
          min(when(col("rk") === 1, col("bin"))).as("argmax_bin"))
    },

    // ---- A11: per-gid spiketrain statistics — MFR, mean ISI, CV, LV
    // (reference: external/bluecv/gid.py:14-61; ISIs via lag, CV uses
    // population std, LV = 3·mean(((i1-i2)/(i1+i2))²) over consecutive pairs) ----
    GQuery(
      "a11_isi_stats",
      cte +
        """, d AS (
          |  SELECT gid, time, event_id,
          |    time - lag(time) OVER (PARTITION BY gid ORDER BY time, event_id) AS isi
          |  FROM spikes),
          |p AS (
          |  SELECT gid, isi,
          |    lag(isi) OVER (PARTITION BY gid ORDER BY time, event_id) AS prev_isi
          |  FROM d)
          |SELECT gid, count(*) + 1 AS n_spikes,
          |  CAST(count(*) + 1 AS DOUBLE) / 2592000.0 AS mfr,
          |  avg(isi) AS mean_isi,
          |  stddev_pop(isi) / avg(isi) AS cv,
          |  3 * avg(power(CAST(isi - prev_isi AS DOUBLE) / NULLIF(isi + prev_isi, 0), 2)) AS lv
          |FROM p WHERE isi IS NOT NULL
          |GROUP BY gid HAVING count(*) >= 2""".stripMargin) { (s, dir) =>
      val sp = Tables.spikes(s, dir)
      val w = Window.partitionBy("gid").orderBy("time", "event_id")
      val d = sp.withColumn("isi", col("time") - lag("time", 1).over(w))
      val p = d.withColumn("prev_isi", lag("isi", 1).over(w))
        .filter(col("isi").isNotNull)
      val ratio = (col("isi") - col("prev_isi")).cast("double") /
        when(col("isi") + col("prev_isi") =!= 0, col("isi") + col("prev_isi"))
      p.groupBy("gid")
        .agg(
          (count(lit(1)) + 1).as("n_spikes"),
          ((count(lit(1)) + 1).cast("double") / lit(2592000.0)).as("mfr"),
          avg("isi").as("mean_isi"),
          (stddev_pop("isi") / avg("isi")).as("cv"),
          (lit(3) * avg(pow(ratio, 2))).as("lv"))
        .filter(col("n_spikes") >= 3)
    },

    // ---- A12: pairwise Pearson correlation of hourly-binned trains for a
    // bounded cohort (reference: external/bluecv/neuron_class.py:47-49;
    // unbounded all-pairs is cartesian — cohort selection is the scale knob).
    // Oracle uses the SAME integer-moment closed form as the engine
    // (n·Σxy − ΣxΣy)/√((n·Σx²−(Σx)²)(n·Σy²−(Σy)²)): on count data every Σ
    // is an exact BIGINT, so the double ops (×, √, ÷) round identically on
    // both sides — bit-deterministic, unlike DuckDB's mean-centered corr()
    // which disagrees with any closed form in the last ulp. ----
    GQuery(
      "a12_correlation_pairs",
      cte +
        """, c AS (
          |  SELECT gid, CAST(time // 3600000000 AS INT) AS bin, count(*) AS cnt
          |  FROM assigned WHERE win = 'day1' AND gid <= 10 GROUP BY 1, 2),
          |g AS (SELECT DISTINCT gid FROM c),
          |b AS (SELECT CAST(x AS INT) AS bin FROM generate_series(0, 23) AS t(x)),
          |dense AS (
          |  SELECT g.gid, b.bin, COALESCE(c.cnt, 0) AS cnt
          |  FROM g CROSS JOIN b LEFT JOIN c ON c.gid = g.gid AND c.bin = b.bin),
          |stats AS (
          |  SELECT gid, sum(cnt) AS sx, sum(cnt * cnt) AS qx FROM dense GROUP BY gid),
          |dots AS (
          |  SELECT d1.gid AS gid1, d2.gid AS gid2, sum(d1.cnt * d2.cnt) AS sxy
          |  FROM dense d1 JOIN dense d2 ON d1.bin = d2.bin AND d1.gid < d2.gid
          |  GROUP BY 1, 2)
          |SELECT p.gid1, p.gid2,
          |  CASE WHEN 24 * s1.qx - s1.sx * s1.sx > 0 AND 24 * s2.qx - s2.sx * s2.sx > 0
          |       THEN (24 * p.sxy - s1.sx * s2.sx)
          |            / sqrt(CAST(24 * s1.qx - s1.sx * s1.sx AS DOUBLE)
          |                 * CAST(24 * s2.qx - s2.sx * s2.sx AS DOUBLE))
          |  END AS r
          |FROM dots p
          |JOIN stats s1 ON s1.gid = p.gid1
          |JOIN stats s2 ON s2.gid = p.gid2""".stripMargin) { (s, dir) =>
      // the oracle-locked instance runs the SAME blocked engine path as a
      // full class would (nBlocks=2 exercises both the same-block and
      // cross-block pair branches); CorrelationSpec drives it at 1k gids
      val c = assigned(s, dir)
        .filter(col("win") === "day1" && col("gid") <= 10)
        .withColumn("bin", expr(s"time div $H").cast("int"))
        .groupBy("gid", "bin").agg(count(lit(1)).as("cnt"))
      pairwiseCorrelation(c, nBins = 24, nBlocks = 2)
    },

    // ---- A12 at FULL-CLASS scale: every gid in the window (~150 at
    // sf0.01 → 11k pairs; 1500 at sf0.1 → 1.1M pairs), oracle-gated —
    // the blocked Gram expansion is hash-checked against DuckDB's
    // per-bin self-join over the SAME integer-moment closed form (exact
    // BIGINT Σ's → bit-deterministic; see a12), not just spec'd
    // (CorrelationSpec: 1k gids) ----
    GQuery(
      "a12c_correlation_class",
      cte +
        """, c AS (
          |  SELECT gid, CAST(time // 3600000000 AS INT) AS bin, count(*) AS cnt
          |  FROM assigned WHERE win = 'day1' GROUP BY 1, 2),
          |g AS (SELECT DISTINCT gid FROM c),
          |b AS (SELECT CAST(x AS INT) AS bin FROM generate_series(0, 23) AS t(x)),
          |dense AS (
          |  SELECT g.gid, b.bin, COALESCE(c.cnt, 0) AS cnt
          |  FROM g CROSS JOIN b LEFT JOIN c ON c.gid = g.gid AND c.bin = b.bin),
          |stats AS (
          |  SELECT gid, sum(cnt) AS sx, sum(cnt * cnt) AS qx FROM dense GROUP BY gid),
          |dots AS (
          |  SELECT d1.gid AS gid1, d2.gid AS gid2, sum(d1.cnt * d2.cnt) AS sxy
          |  FROM dense d1 JOIN dense d2 ON d1.bin = d2.bin AND d1.gid < d2.gid
          |  GROUP BY 1, 2)
          |SELECT p.gid1, p.gid2,
          |  CASE WHEN 24 * s1.qx - s1.sx * s1.sx > 0 AND 24 * s2.qx - s2.sx * s2.sx > 0
          |       THEN (24 * p.sxy - s1.sx * s2.sx)
          |            / sqrt(CAST(24 * s1.qx - s1.sx * s1.sx AS DOUBLE)
          |                 * CAST(24 * s2.qx - s2.sx * s2.sx AS DOUBLE))
          |  END AS r
          |FROM dots p
          |JOIN stats s1 ON s1.gid = p.gid1
          |JOIN stats s2 ON s2.gid = p.gid2""".stripMargin) { (s, dir) =>
      val c = assigned(s, dir)
        .filter(col("win") === "day1")
        .withColumn("bin", expr(s"time div $H").cast("int"))
        .groupBy("gid", "bin").agg(count(lit(1)).as("cnt"))
      pairwiseCorrelation(c, nBins = 24, nBlocks = 8)
    },

    // ---- A14: complexity PDF — distribution of #simultaneously-active
    // gids per 1-min bin incl. empty bins (reference: bluecv/neuron_class.py:52-55) ----
    GQuery(
      "a14_complexity_pdf",
      cte +
        """, cx AS (
          |  SELECT CAST(time // 60000000 AS INT) AS bin, count(DISTINCT gid) AS complexity
          |  FROM assigned WHERE win = 'day1' GROUP BY 1),
          |b AS (SELECT CAST(x AS INT) AS bin FROM generate_series(0, 1439) AS t(x)),
          |dense AS (
          |  SELECT b.bin, COALESCE(cx.complexity, 0) AS complexity
          |  FROM b LEFT JOIN cx ON cx.bin = b.bin)
          |SELECT complexity, count(*) AS n_bins, count(*) / 1440.0 AS p
          |FROM dense GROUP BY complexity""".stripMargin) { (s, dir) =>
      val cx = assigned(s, dir).filter(col("win") === "day1")
        .withColumn("bin", expr("time div 60000000").cast("int"))
        .groupBy("bin").agg(countDistinct("gid").as("complexity"))
      val b = s.range(0, 1440).select(col("id").cast("int").as("bin"))
      b.join(cx, Seq("bin"), "left")
        .select(coalesce(col("complexity"), lit(0L)).as("complexity"))
        .groupBy("complexity")
        .agg(count(lit(1)).as("n_bins"), (count(lit(1)) / lit(1440.0)).as("p"))
    },

    // ---- A17: onset detection — first bin above baseline mean + 2σ
    // (reference: external/bnac/calculate_trial_step.py:19-112; baseline =
    // first 24 hourly bins, scan the rest) ----
    GQuery(
      "a17_onset_detection",
      cte + "," + denseHistSql("full", 720) +
        """, base AS (
          |  SELECT event_type, avg(cnt) AS mu, stddev_pop(cnt) AS sd
          |  FROM dense WHERE bin < 24 GROUP BY event_type)
          |SELECT d.event_type, base.mu + 2 * base.sd AS threshold,
          |  min(CASE WHEN d.bin >= 24 AND d.cnt > base.mu + 2 * base.sd THEN d.bin END) AS onset_bin
          |FROM dense d JOIN base ON base.event_type = d.event_type
          |GROUP BY d.event_type, base.mu, base.sd""".stripMargin) { (s, dir) =>
      val dense = denseHist(s, dir, "full", 720)
      val base = dense.filter(col("bin") < 24)
        .groupBy("event_type")
        .agg(avg("cnt").as("mu"), stddev_pop("cnt").as("sd"))
      dense.join(broadcast(base), "event_type")
        .groupBy("event_type", "mu", "sd")
        .agg(min(when(col("bin") >= 24 && col("cnt") > col("mu") + lit(2) * col("sd"),
          col("bin"))).as("onset_bin"))
        .select(
          col("event_type"), (col("mu") + lit(2) * col("sd")).as("threshold"),
          col("onset_bin"))
    },

    // ---- O4: deterministic seeded sampling — md5-ranked limit per group
    // (reference: extract/neurons.py:82-83 np.random.choice; distributive
    // redefinition per SURVEY §7.4: hash ranking, same both engines) ----
    GQuery(
      "o4_seeded_sample",
      cte +
        """, g AS (SELECT DISTINCT event_type, gid FROM spikes)
          |SELECT event_type, gid FROM (
          |  SELECT event_type, gid,
          |    row_number() OVER (PARTITION BY event_type
          |                       ORDER BY md5(CAST(gid AS VARCHAR) || ':42'), gid) AS rk
          |  FROM g) WHERE rk <= 5""".stripMargin) { (s, dir) =>
      val g = Tables.spikes(s, dir).select("event_type", "gid").distinct()
      val key = md5(concat(col("gid").cast("string"), lit(":42")))
      val w = Window.partitionBy("event_type").orderBy(key, col("gid"))
      g.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select("event_type", "gid")
    },

    // ---- U1: union by name with missing columns (smart_concat —
    // reference: blueetl-core, used at extract/spikes.py:56) ----
    GQuery(
      "u1_union_by_name",
      cte +
        """SELECT event_id, gid, value, CAST(NULL AS VARCHAR) AS event_type
          |FROM spikes WHERE event_type = 'click'
          |UNION ALL
          |SELECT event_id, gid, CAST(NULL AS DOUBLE) AS value, event_type
          |FROM spikes WHERE event_type = 'error'""".stripMargin) { (s, dir) =>
      val sp = Tables.spikes(s, dir)
      val a = sp.filter(col("event_type") === "click").select("event_id", "gid", "value")
      val b = sp.filter(col("event_type") === "error").select("event_id", "gid", "event_type")
      a.unionByName(b, allowMissingColumns = true)
    },

    // ---- §2.5: incremental index per group (neuron_class_index —
    // reference: extract/neurons.py:139-143) ----
    GQuery(
      "w2_group_index",
groupIndexOracle) { (s, dir) =>
      val g = Tables.spikes(s, dir).select("event_type", "gid").distinct()
      val w = Window.partitionBy("event_type").orderBy("gid")
      g.withColumn("idx", row_number().over(w) - 1)
    },

    // ---- w2's SCALE PATH under the same oracle: plans.GroupIndex.dense,
    // the two-pass range-repartitioned dense ranking that replaces the
    // one-task-per-key window when a group outgrows a single task
    // (BASELINE.md measured the crossover at x1000). Gating it means the
    // driver checks the 100 TB ranking path itself every round, not just
    // the window form it substitutes for. ----
    GQuery(
      "w5_group_index_dense",
groupIndexOracle) { (s, dir) =>
      graft.plans.GroupIndex.dense(
        Tables.spikes(s, dir).select("event_type", "gid").distinct(),
        Seq("event_type"), Seq("gid"))
    },

    // ---- §2.5: normalize by group max (hist/max_hist —
    // reference: bnac/calculate_features.py:81-84) ----
    GQuery(
      "w3_norm_by_group_max",
      cte + "," + denseHistSql("day1", 24) +
        """SELECT event_type, bin, cnt,
          |  CAST(cnt AS DOUBLE) / max(cnt) OVER (PARTITION BY event_type) AS norm
          |FROM dense""".stripMargin) { (s, dir) =>
      val dense = denseHist(s, dir, "day1", 24)
      val w = Window.partitionBy("event_type")
      dense.withColumn("norm", col("cnt").cast("double") / max("cnt").over(w))
    },

    // ---- §2.5: running cumulative total per group (event accumulation
    // curve — cumulative frame ROWS UNBOUNDED PRECEDING..CURRENT) ----
    GQuery(
      "w4_running_total",
      cte + "," + denseHistSql("day1", 24) +
        """SELECT event_type, bin, cnt,
          |  CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
          |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          |FROM dense""".stripMargin) { (s, dir) =>
      val dense = denseHist(s, dir, "day1", 24)
      val w = Window.partitionBy("event_type").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dense.withColumn("cum", sum("cnt").over(w))
    },

    // ---- A3: per-trial mean of per-gid counts (silent gids = 0 —
    // reference: external/bnac/calculate_features.py:38-44) ----
    GQuery(
      "a3_mean_count_per_trial",
      cte +
        """, g AS (SELECT DISTINCT gid FROM assigned WHERE win = 'early'),
          |t AS (SELECT DISTINCT trial FROM wins WHERE win = 'early'),
          |c AS (SELECT gid, trial, count(*) AS cnt FROM assigned WHERE win = 'early' GROUP BY 1, 2)
          |SELECT t.trial, avg(COALESCE(c.cnt, 0)) AS mean_count
          |FROM g CROSS JOIN t LEFT JOIN c ON c.gid = g.gid AND c.trial = t.trial
          |GROUP BY t.trial""".stripMargin) { (s, dir) =>
      val a = assigned(s, dir).filter(col("win") === "early")
      val gids = a.select("gid").distinct()
      val trials = windowsDf(s).filter(col("win") === "early").select("trial")
      val counts = a.groupBy("gid", "trial").agg(count(lit(1)).as("cnt"))
      gids.crossJoin(broadcast(trials))
        .join(counts, Seq("gid", "trial"), "left")
        .groupBy("trial")
        .agg(avg(coalesce(col("cnt"), lit(0L))).as("mean_count"))
    },

    // ---- A13: periodogram (single-segment power spectrum) of the binned
    // class activity, as a relational DFT — frequency table × bins, cos/sin
    // projections (reference: external/bluecv/neuron_class.py:38-44
    // welch_psd; Welch's segmented averaging reduces to this with one
    // segment) ----
    GQuery(
      "a13_periodogram",
      cte + "," + denseHistSql("day1", 24) +
        """, freq AS (SELECT CAST(k AS INT) AS k FROM generate_series(0, 12) AS t(k))
          |SELECT d.event_type, f.k,
          |  power(sum(d.cnt * cos(2 * pi() * f.k * d.bin / 24.0)), 2)
          |    + power(sum(d.cnt * sin(2 * pi() * f.k * d.bin / 24.0)), 2) AS power
          |FROM dense d CROSS JOIN freq f
          |GROUP BY d.event_type, f.k""".stripMargin) { (s, dir) =>
      val dense = denseHist(s, dir, "day1", 24)
      val freq = s.range(0, 13).select(col("id").cast("int").as("k"))
      val phase = lit(2) * lit(math.Pi) * col("k") * col("bin") / lit(24.0)
      dense.crossJoin(broadcast(freq))
        .groupBy("event_type", "k")
        .agg((pow(sum(col("cnt") * cos(phase)), 2) +
          pow(sum(col("cnt") * sin(phase)), 2)).as("power"))
    },

    // ---- A13 (full): Welch PSD — average the periodogram over two
    // half-day segments (segmented averaging is what distinguishes Welch
    // from the plain DFT; reference: elephant welch_psd n_segments) ----
    GQuery(
      "a13b_welch_psd",
      cte + "," + denseHistSql("day1", 24) +
        """, seg AS (
          |  SELECT event_type, bin // 12 AS segment, bin % 12 AS sbin, cnt FROM dense),
          |freq AS (SELECT CAST(k AS INT) AS k FROM generate_series(0, 6) AS t(k)),
          |per AS (
          |  SELECT s.event_type, s.segment, f.k,
          |    power(sum(s.cnt * cos(2 * pi() * f.k * s.sbin / 12.0)), 2)
          |      + power(sum(s.cnt * sin(2 * pi() * f.k * s.sbin / 12.0)), 2) AS p
          |  FROM seg s CROSS JOIN freq f
          |  GROUP BY s.event_type, s.segment, f.k)
          |SELECT event_type, k, avg(p) AS psd FROM per GROUP BY event_type, k""".stripMargin) {
      (s, dir) =>
        val seg = denseHist(s, dir, "day1", 24)
          .select(
            col("event_type"), expr("bin div 12").as("segment"),
            (col("bin") % 12).as("sbin"), col("cnt"))
        val freq = s.range(0, 7).select(col("id").cast("int").as("k"))
        val phase = lit(2) * lit(math.Pi) * col("k") * col("sbin") / lit(12.0)
        seg.crossJoin(broadcast(freq))
          .groupBy("event_type", "segment", "k")
          .agg((pow(sum(col("cnt") * cos(phase)), 2) +
            pow(sum(col("cnt") * sin(phase)), 2)).as("p"))
          .groupBy("event_type", "k")
          .agg(avg("p").as("psd"))
    },

    // ---- A16: Van Rossum spike-train distance — exponential-kernel inner
    // products over blocked train pairs, VR²(f,g) = <f,f> + <g,g> - 2<f,g>
    // (reference: external/bluecv/comparison.py:11-21); the oracle keeps
    // the gated cohort, the engine path scales to whole classes
    // (A16BlockedSpec drives 1k gids) ----
    GQuery(
      "a16_van_rossum", {
        val tau = "3600000000.0"
        cte +
          s""", ev AS (SELECT gid, time FROM assigned WHERE win = 'full' AND gid <= 6),
             |selfk AS (
             |  SELECT a.gid, sum(exp(-abs(a.time - b.time) / $tau)) AS kk
             |  FROM ev a JOIN ev b ON a.gid = b.gid GROUP BY a.gid),
             |crossk AS (
             |  SELECT a.gid AS gid1, b.gid AS gid2,
             |    sum(exp(-abs(a.time - b.time) / $tau)) AS kk
             |  FROM ev a JOIN ev b ON a.gid < b.gid GROUP BY a.gid, b.gid)
             |SELECT c.gid1, c.gid2, s1.kk + s2.kk - 2 * c.kk AS vr2
             |FROM crossk c
             |JOIN selfk s1 ON s1.gid = c.gid1 JOIN selfk s2 ON s2.gid = c.gid2""".stripMargin
      }) { (s, dir) =>
      // full-class shape: per-gid trains with their self-kernels computed
      // ONCE (one shuffle), then the blocked equi-join pair expansion —
      // never a per-event theta join (events² rows) or a nested loop
      val tau = 3600000000.0
      val trains = assigned(s, dir)
        .filter(col("win") === "full" && col("gid") <= 6)
        .groupBy("gid")
        .agg(sort_array(collect_list(col("time").cast("double"))).as("train"))
        .withColumn("kk", vrKernel("train", "train", tau))
      blockedSelfPairs(trains, nBlocks = 4)
        .select(
          col("gid1"), col("gid2"),
          (col("kk1") + col("kk2") -
            lit(2) * vrKernel("train1", "train2", tau)).as("vr2"))
    },

    // ---- A16 at FULL-CLASS scale: the same Van Rossum metric over every
    // gid in the window (no cohort bound — ~150 gids / ~11k pairs at
    // sf0.01), oracle-gated: the blocked pair expansion and nested-
    // aggregate kernels are hash-checked against DuckDB's theta-join
    // formulation, not just spec'd (A16BlockedSpec covers 1k gids) ----
    GQuery(
      "a16c_van_rossum_class", {
        val tau = "3600000000.0"
        cte +
          s""", ev AS (SELECT gid, time FROM assigned WHERE win = 'full'),
             |selfk AS (
             |  SELECT a.gid, sum(exp(-abs(a.time - b.time) / $tau)) AS kk
             |  FROM ev a JOIN ev b ON a.gid = b.gid GROUP BY a.gid),
             |crossk AS (
             |  SELECT a.gid AS gid1, b.gid AS gid2,
             |    sum(exp(-abs(a.time - b.time) / $tau)) AS kk
             |  FROM ev a JOIN ev b ON a.gid < b.gid GROUP BY a.gid, b.gid)
             |SELECT c.gid1, c.gid2, s1.kk + s2.kk - 2 * c.kk AS vr2
             |FROM crossk c
             |JOIN selfk s1 ON s1.gid = c.gid1 JOIN selfk s2 ON s2.gid = c.gid2""".stripMargin
      }) { (s, dir) =>
      val tau = 3600000000.0
      val trains = assigned(s, dir)
        .filter(col("win") === "full")
        .groupBy("gid")
        .agg(sort_array(collect_list(col("time").cast("double"))).as("train"))
        .withColumn("kk", vrKernel("train", "train", tau))
      blockedSelfPairs(trains, nBlocks = 8)
        .select(
          col("gid1"), col("gid2"),
          (col("kk1") + col("kk2") -
            lit(2) * vrKernel("train1", "train2", tau)).as("vr2"))
    },

    // ---- A16 (other half): Victor-Purpura distance — imperative DP kernel
    // surfaced as the codegen vp_distance Expression over collected per-gid
    // trains (no boxed UDF in the plan). q = 1/(1h). The oracle runs the
    // SAME edit DP as a DuckDB recursive CTE: each recursion level is one
    // DP row carried as a list; the within-row dependency
    // cur[j] = min(A_j, cur[j-1]+1) is resolved by the min-plus prefix
    // identity cur[j] = j + min_{k<=j}(A_k - k), so a level is pure
    // list_transform with no sequential fold. Trains are the bounded a16
    // cohort (57–78 spikes at sf0.01), so the O(n·m²) list DP stays tiny.
    // The kernel is additionally unit-tested against brute force in
    // VictorPurpuraSpec. ----
    GQuery(
      "a16b_victor_purpura", {
        val q = s"${1.0 / 3600000000.0}"
        // the shared prefix, made recursion-capable
        cte.replaceFirst("^WITH ", "WITH RECURSIVE ") +
          s""", ev AS (SELECT gid, time FROM assigned WHERE win = 'full' AND gid <= 6),
             |trains AS (
             |  SELECT gid, list_sort(list(CAST(time AS DOUBLE))) AS train
             |  FROM ev GROUP BY gid),
             |pairs AS (
             |  SELECT a.gid AS gid1, b.gid AS gid2, a.train AS t1, b.train AS t2,
             |         len(a.train) AS n1, len(b.train) AS n2
             |  FROM trains a JOIN trains b ON a.gid < b.gid),
             |dp AS (
             |  SELECT gid1, gid2, t1, t2, n1, n2, 0 AS i,
             |         list_transform(range(0, n2 + 1), j -> CAST(j AS DOUBLE)) AS row
             |  FROM pairs
             |  UNION ALL
             |  SELECT gid1, gid2, t1, t2, n1, n2, i + 1,
             |         list_transform(range(0, n2 + 1),
             |           j -> CAST(j AS DOUBLE) + list_aggregate(list_slice(B, 1, j + 1), 'min')) AS row
             |  FROM (
             |    SELECT *, list_prepend(CAST(i + 1 AS DOUBLE),
             |        list_transform(range(1, n2 + 1),
             |          k -> least(row[k + 1] + 1, row[k] + $q * abs(t1[i + 1] - t2[k]))
             |               - CAST(k AS DOUBLE))) AS B
             |    FROM dp WHERE i < n1))
             |SELECT gid1, gid2, row[n2 + 1] AS vp FROM dp WHERE i = n1""".stripMargin
      }) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val trains = assigned(s, dir)
        .filter(col("win") === "full" && col("gid") <= 6)
        .groupBy("gid")
        .agg(sort_array(collect_list(col("time").cast("double"))).as("train"))
      // blocked equi-join pair expansion (full-class path); VP distance is
      // symmetric, so the gid1<gid2 normalization is free
      blockedSelfPairs(trains, nBlocks = 4)
        .select(
          col("gid1"), col("gid2"),
          expr(s"vp_distance(train1, train2, ${1.0 / 3600000000.0}d)").as("vp"))
    },

    // ---- J4 at data scale: binned large-large range join — per-gid
    // intervals (data-sized, NOT broadcastable in general) equi-joined on
    // (gid, time bucket) with the exact range residual; both sides shuffle
    // once by hash, no nested loop (graft.plans.RangeJoin) ----
    GQuery(
      "j9_range_join_binned",
      s"""WITH ev AS (
         |  SELECT CAST(epoch_us(ts) - $Origin AS DOUBLE) AS time, user_id AS gid
         |  FROM events),
         |iv AS (
         |  SELECT gid, CAST((gid % 20) * ${6 * H} AS DOUBLE) AS lo,
         |         CAST((gid % 20) * ${6 * H} + ${12 * H} AS DOUBLE) AS hi
         |  FROM (SELECT DISTINCT gid FROM ev))
         |SELECT e.gid, e.time, i.lo, i.hi
         |FROM ev e JOIN iv i ON i.gid = e.gid AND e.time >= i.lo AND e.time < i.hi""".stripMargin) {
      (s, dir) =>
        val ev = Tables.spikes(s, dir)
          .select(col("gid"), col("time").cast("double").as("time"))
        val iv = ev.select("gid").distinct()
          .withColumn("lo", (col("gid") % 20).cast("double") * lit(6.0 * H))
          .withColumn("hi", col("lo") + lit(12.0 * H))
        graft.plans.RangeJoin.binned(ev, "time", iv, "lo", "hi", keys = Seq("gid"))
          .select("gid", "time", "lo", "hi")
    },

    // ---- Streaming extension, batch form: tumbling event-time window.
    // The same plan runs under readStream + watermark (see streaming spec). ----
    GQuery(
      "s1_tumbling_window",
      """SELECT time_bucket(INTERVAL 1 DAY, ts) AS day, event_type,
        |  count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 day").as("wnd"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("wnd.start").as("day"), col("event_type"), col("n"), col("sum_value"))
    },

    // ---- Streaming extension: per-gid burst sessionization (gap ≥ 2h
    // closes a session). The gate runs the BATCH restatement; the
    // streaming mapGroupsWithState form is pinned equal to it by
    // StreamOpsSpec on the same input. ----
    GQuery(
      "s2_sessionize",
      s"""WITH ev AS (
         |  SELECT user_id AS gid, epoch_us(ts) - $Origin AS time FROM events),
         |marked AS (
         |  SELECT gid, time,
         |    CASE WHEN lag(time) OVER (PARTITION BY gid ORDER BY time) IS NULL
         |           OR time - lag(time) OVER (PARTITION BY gid ORDER BY time)
         |              >= ${2 * H}
         |         THEN 1 ELSE 0 END AS new_session
         |  FROM ev),
         |tagged AS (
         |  SELECT gid, time,
         |    CAST(SUM(new_session) OVER (PARTITION BY gid ORDER BY time
         |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         |  FROM marked)
         |SELECT gid, session_id, count(*) AS n_events,
         |  min(time) AS t_start, max(time) AS t_end,
         |  max(time) - min(time) AS span
         |FROM tagged GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      graft.streaming.StreamOps.sessionizeBatch(
        Tables.spikes(s, dir).select("gid", "time"), gapMicros = 2 * H)
    },

    // ---- Streaming extension: exact dedup with watermark-bounded state.
    // Batch form of dropDuplicatesWithinWatermark keeps one row per key;
    // projecting the keys makes the kept-row choice immaterial, so the
    // oracle is the distinct key set. ----
    GQuery(
      "s3_stream_dedupe",
      s"""SELECT DISTINCT user_id AS gid, event_type,
         |  time_bucket(INTERVAL 1 DAY, ts) AS day
         |FROM events""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("gid"), col("event_type"),
          date_trunc("day", col("ts")).as("day"), col("ts"))
      graft.streaming.StreamOps.dedupeStream(
        ev, keys = Seq("gid", "event_type", "day"), watermark = "1 day")
        .select("gid", "event_type", "day")
    },

    // ---- Streaming extension: stream-static enrichment join + per-class
    // windowed counts (the incremental PSTH). The gate runs the batch
    // form of the SAME StreamOps plan; StreamOpsSpec pins the streaming
    // two-micro-batch run equal to it. ----
    GQuery(
      "s4_stream_enriched_counts",
      """WITH classes AS (
        |  SELECT DISTINCT user_id AS gid,
        |    CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS neuron_class
        |  FROM events)
        |SELECT time_bucket(INTERVAL 1 DAY, e.ts) AS day, c.neuron_class,
        |  count(*) AS n,
        |  CAST(SUM(CAST(e.value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
        |FROM events e JOIN classes c ON c.gid = e.user_id
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("gid"), col("ts"), col("value"))
      val classes = ev.select("gid").distinct()
        .withColumn("neuron_class",
          when(col("gid") % 2 === 0, "even").otherwise("odd"))
      graft.streaming.StreamOps.enrichedClassCounts(ev, classes, "1 day", "0 seconds")
    },

    // ---- Streaming extension: stream-stream attribution join — each
    // purchase joined to the same user's clicks in the preceding hour,
    // watermark-bounded buffers on both sides. The gate runs the batch
    // form of the SAME StreamOps plan; StreamOpsSpec pins the streaming
    // two-micro-batch run equal to it. ----
    GQuery(
      "s5_stream_attribution",
      """SELECT p.user_id AS gid, c.event_id AS l_id, p.event_id AS r_id,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
        |FROM events p JOIN events c
        |  ON c.user_id = p.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND epoch_us(c.ts) <= epoch_us(p.ts)
        | AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("gid"), col("event_id"), col("ts"), col("event_type"))
      graft.streaming.StreamOps.attributionJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        windowMicros = 3600000000L, watermark = "2 days")
    },

    // ---- Streaming extension: stream-stream LEFT OUTER interval join —
    // the semantics class s5 doesn't cover: a click with NO purchase in
    // the following hour still emits (with nulls), but only after the
    // watermark proves no partner can arrive. Batch restatement = plain
    // left join; StreamOpsSpec pins the watermark-flushed streaming run
    // equal to it. ----
    GQuery(
      "s6_stream_left_outer_attribution",
      """SELECT c.user_id AS gid, c.event_id AS l_id, p.event_id AS r_id,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON p.user_id = c.user_id
        | AND epoch_us(c.ts) <= epoch_us(p.ts)
        | AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("gid"), col("event_id"), col("ts"), col("event_type"))
      graft.streaming.StreamOps.attributionJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        windowMicros = 3600000000L, watermark = "2 days", joinType = "left_outer")
    }
  )
}
