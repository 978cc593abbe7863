package graft.queries

import graft.Tables
import graft.dsl._
import graft.engine._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{array_join, col, transform}

/** End-to-end engine queries: the full Analyzer pipeline (campaign →
  * simulations/neurons/windows extraction → range-join report → features)
  * over a campaign whose single simulation IS the testdata events table,
  * so the DuckDB oracle can replicate the whole computation in SQL.
  * This puts the engine facade itself under the driver's correctness gate,
  * not just the individual operators.
  */
object Engine {

  private val H = 3600000000L
  private val D = 24 * H
  private val Origin = Tables.EventsEpochMicros

  private def analyzer(s: SparkSession, dir: String): Analyzer = {
    val campaign = Campaign(
      name = "testdata",
      pathPrefix = dir,
      attrs = Map.empty,
      rows = Seq(Map(
        "simulation_path" -> "events.parquet",
        "circuit_path" -> s"$dir/events.parquet",
        "ca" -> 1.1)))
    val cfg = SingleAnalysisConfig(
      name = "spikes",
      reportType = "spikes",
      windows = Map(
        "w1" -> WindowSpec(
          bounds = (0.0, 12.0 * H), nTrials = 3, trialStepsValue = D.toDouble),
        "w2" -> WindowSpec(bounds = (0.0, 7.0 * D))),
      neuronClasses = Map(
        "even" -> NeuronClassSpec(query = QAnd("parity" -> QCond(QEq(0)))),
        "odd" -> NeuronClassSpec(query = QAnd("parity" -> QCond(QEq(1))))),
      features = Seq(
        FeaturesSpec(
          groupby = Seq("simulation_id", "circuit_id", "neuron_class", "window"),
          function = "mean_firing_rates",
          // micros-scale times need an explicit PSTH bin (the reference's
          // 1-unit default is meant for ms times); σ=4 bins like bnac
          params = Map("hist_bin_size" -> (6.0 * H), "sigma" -> 4.0))))
    new Analyzer(s, cfg, campaign, new EventsAdapter, QTrue, None)
  }

  // Shared oracle: replicate campaign/extraction relationally over events.
  private val oracleCte =
    s"""WITH spikes AS (
       |  SELECT CAST(epoch_us(ts) - $Origin AS DOUBLE) AS time, user_id AS gid FROM events),
       |nodes AS (SELECT DISTINCT gid FROM spikes),
       |classes AS (
       |  SELECT gid, CASE WHEN gid % 2 = 0 THEN 'even' ELSE 'odd' END AS neuron_class
       |  FROM nodes),
       |wins AS (
       |  SELECT * FROM (VALUES
       |    ('w1', 0, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(${12 * H} AS DOUBLE), CAST(${12 * H} AS DOUBLE)),
       |    ('w1', 1, CAST($D AS DOUBLE), CAST(0 AS DOUBLE), CAST(${12 * H} AS DOUBLE), CAST(${12 * H} AS DOUBLE)),
       |    ('w1', 2, CAST(${2 * D} AS DOUBLE), CAST(0 AS DOUBLE), CAST(${12 * H} AS DOUBLE), CAST(${12 * H} AS DOUBLE)),
       |    ('w2', 0, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(${7 * D} AS DOUBLE), CAST(${7 * D} AS DOUBLE))
       |  ) AS w(win, trial, w_offset, t_start, t_stop, duration)),
       |assigned AS (
       |  SELECT w.win, w.trial, w.duration, c.neuron_class, s.gid,
       |    s.time - w.w_offset AS time
       |  FROM spikes s
       |  JOIN wins w ON s.time >= w.w_offset + w.t_start AND s.time < w.w_offset + w.t_stop
       |  JOIN classes c ON c.gid = s.gid)
       |""".stripMargin

  private val BS = 6 * H // mean_firing_rates hist_bin_size in the gate config

  // The bnac PSTH frame over `assigned`: counts per BS-sized bin normalized
  // by (class member count × window trial count) — appended after oracleCte.
  private val histCte =
    s""", nc AS (SELECT neuron_class, count(*) AS n_cells FROM classes GROUP BY 1),
       |wt AS (SELECT win, count(*) AS n_trials, max(t_stop) AS ts2 FROM wins GROUP BY 1),
       |hgroups AS (SELECT DISTINCT neuron_class, win FROM assigned),
       |hbins AS (
       |  SELECT g.neuron_class, g.win, CAST(x AS BIGINT) AS bin
       |  FROM hgroups g JOIN wt ON wt.win = g.win,
       |       LATERAL (SELECT unnest(generate_series(0,
       |         CAST(CEIL(wt.ts2 / $BS) AS BIGINT) - 1)) AS x)),
       |hcounts AS (
       |  SELECT neuron_class, win, CAST(FLOOR(time / $BS) AS BIGINT) AS bin,
       |    count(*) AS c
       |  FROM assigned GROUP BY 1, 2, 3),
       |hist AS (
       |  SELECT b.neuron_class, b.win, b.bin,
       |    CAST(COALESCE(h.c, 0) AS DOUBLE) / (nc.n_cells * wt.n_trials) AS hist
       |  FROM hbins b
       |  JOIN nc ON nc.neuron_class = b.neuron_class
       |  JOIN wt ON wt.win = b.win
       |  LEFT JOIN hcounts h ON h.neuron_class = b.neuron_class
       |    AND h.win = b.win AND h.bin = b.bin)
       |""".stripMargin

  // Scalar rollup of the hist frame (argmax = FIRST bin attaining the max,
  // np.argmax semantics) — the four columns merged into by_neuron_class.
  private val hstatsCte =
    """, hstats AS (
      |  SELECT neuron_class, win,
      |    CAST(SUM(CAST(hist AS DECIMAL(38,18))) AS DOUBLE) / COUNT(hist) AS mean_of_hist,
      |    MIN(hist) AS min_of_hist, MAX(hist) AS max_of_hist,
      |    MIN(CASE WHEN rk = 1 THEN bin END) AS argmax_bin
      |  FROM (SELECT *, row_number() OVER (PARTITION BY neuron_class, win
      |                                     ORDER BY hist DESC, bin) AS rk FROM hist)
      |  GROUP BY 1, 2)
      |""".stripMargin

  val all: Seq[GQuery] = Seq(

    // Full pipeline → by_gid mean firing rates (counts per trial with
    // absent-trial zero fill, rate from window duration)
    GQuery(
      "e1_engine_rates_by_gid",
      oracleCte +
        """, counts AS (
          |  SELECT neuron_class, win, trial, gid, count(*) AS cnt, min(time) AS first_spike
          |  FROM assigned GROUP BY 1, 2, 3, 4)
          |SELECT 0 AS simulation_id, 0 AS circuit_id, c.neuron_class, w.win AS window, c.gid,
          |  avg(COALESCE(k.cnt, 0)) AS mean_count,
          |  avg(k.first_spike) AS mean_first_spike,
          |  avg(COALESCE(k.cnt, 0)) * 1000.0 / w.duration AS mean_firing_rate
          |FROM classes c
          |CROSS JOIN wins w
          |LEFT JOIN counts k ON k.neuron_class = c.neuron_class AND k.win = w.win
          |  AND k.trial = w.trial AND k.gid = c.gid
          |GROUP BY c.neuron_class, w.win, c.gid, w.duration""".stripMargin) { (s, dir) =>
      analyzer(s, dir).calculateFeatures()("by_gid")
    },

    // Class-level rollup of the same pipeline (population σ — reference
    // uses numpy ddof=0 std at bnac/calculate_features.py:63) + the four
    // histogram scalars bnac merges into by_neuron_class (lines 130-155)
    GQuery(
      "e2_engine_rates_by_class",
      oracleCte + histCte + hstatsCte +
        """, counts AS (
          |  SELECT neuron_class, win, trial, gid, count(*) AS cnt, min(time) AS first_spike
          |  FROM assigned GROUP BY 1, 2, 3, 4),
          |by_gid AS (
          |  SELECT c.neuron_class, w.win AS win, c.gid,
          |    avg(COALESCE(k.cnt, 0)) AS mc,
          |    avg(COALESCE(k.cnt, 0)) * 1000.0 / w.duration AS rate,
          |    avg(k.first_spike) AS mfs
          |  FROM classes c
          |  CROSS JOIN wins w
          |  LEFT JOIN counts k ON k.neuron_class = c.neuron_class AND k.win = w.win
          |    AND k.trial = w.trial AND k.gid = c.gid
          |  GROUP BY c.neuron_class, w.win, c.gid, w.duration),
          |agg AS (
          |  SELECT neuron_class, win,
          |    CAST(SUM(CAST(mc AS DECIMAL(20,6))) AS DOUBLE) / COUNT(mc) AS mmc,
          |    CAST(SUM(CAST(rate AS DECIMAL(20,6))) AS DOUBLE) / COUNT(rate) AS m,
          |    CAST(SUM(CAST(rate * rate AS DECIMAL(20,6))) AS DOUBLE) / COUNT(rate) AS m2,
          |    CAST(SUM(CAST(mfs AS DECIMAL(20,6))) AS DOUBLE) / COUNT(mfs) AS mmfs
          |  FROM by_gid GROUP BY 1, 2)
          |SELECT 0 AS simulation_id, 0 AS circuit_id, agg.neuron_class, agg.win AS window,
          |  mmc AS mean_of_mean_spike_counts,
          |  m AS mean_of_mean_firing_rates,
          |  SQRT(GREATEST(m2 - m * m, 0)) AS std_of_mean_firing_rates,
          |  mmfs AS mean_of_mean_first_spikes,
          |  h.mean_of_hist, h.min_of_hist, h.max_of_hist, h.argmax_bin
          |FROM agg
          |LEFT JOIN hstats h ON h.neuron_class = agg.neuron_class
          |  AND h.win = agg.win""".stripMargin) { (s, dir) =>
      analyzer(s, dir).calculateFeatures()("by_neuron_class")
    },

    // The extracted report itself (J4 + class tagging through the facade)
    GQuery(
      "e3_engine_report",
      oracleCte +
        """SELECT 0 AS simulation_id, 0 AS circuit_id, neuron_class, win AS window, trial, time, gid
          |FROM assigned""".stripMargin) { (s, dir) =>
      analyzer(s, dir).report
    },

    // Frame-report path (soma analog: events.value is the signal) through
    // the facade: extraction keeps the value column, SomaStats aggregates
    // per class/window (sample std — reference: soma/calculate_features.py:12)
    GQuery(
      "e4_engine_soma_stats",
      s"""WITH frames AS (
         |  SELECT CAST(epoch_us(ts) - $Origin AS DOUBLE) AS time, user_id AS gid,
         |    value FROM events),
         |classes AS (
         |  SELECT gid, CASE WHEN gid % 2 = 0 THEN 'even' ELSE 'odd' END AS neuron_class
         |  FROM (SELECT DISTINCT gid FROM frames)),
         |wins AS (
         |  SELECT * FROM (VALUES
         |    ('w1', 0, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(${12 * H} AS DOUBLE)),
         |    ('w1', 1, CAST($D AS DOUBLE), CAST(0 AS DOUBLE), CAST(${12 * H} AS DOUBLE)),
         |    ('w1', 2, CAST(${2 * D} AS DOUBLE), CAST(0 AS DOUBLE), CAST(${12 * H} AS DOUBLE)),
         |    ('w2', 0, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(${7 * D} AS DOUBLE))
         |  ) AS w(win, trial, w_offset, t_start, t_stop))
         |SELECT 0 AS simulation_id, 0 AS circuit_id, c.neuron_class, w.win AS window,
         |  avg(f.value) AS mean, stddev_samp(f.value) AS std,
         |  min(f.value) AS min, max(f.value) AS max
         |FROM frames f
         |JOIN wins w ON f.time >= w.w_offset + w.t_start AND f.time < w.w_offset + w.t_stop
         |JOIN classes c ON c.gid = f.gid
         |GROUP BY c.neuron_class, w.win""".stripMargin) { (s, dir) =>
      val somaCfg = SingleAnalysisConfig(
        name = "soma",
        reportType = "soma",
        windows = Map(
          "w1" -> WindowSpec(
            bounds = (0.0, 12.0 * H), nTrials = 3, trialStepsValue = D.toDouble),
          "w2" -> WindowSpec(bounds = (0.0, 7.0 * D))),
        neuronClasses = Map(
          "even" -> NeuronClassSpec(query = QAnd("parity" -> QCond(QEq(0)))),
          "odd" -> NeuronClassSpec(query = QAnd("parity" -> QCond(QEq(1))))),
        features = Seq(
          FeaturesSpec(
            groupby = Seq("simulation_id", "circuit_id", "neuron_class", "window"),
            function = "soma_stats")))
      val campaign = Campaign(
        name = "testdata", pathPrefix = dir, attrs = Map.empty,
        rows = Seq(Map(
          "simulation_path" -> "events.parquet",
          "circuit_path" -> s"$dir/events.parquet")))
      new Analyzer(s, somaCfg, campaign, new EventsAdapter, QTrue, None)
        .calculateFeatures()("by_group")
    },

    // X1 registry: class-level pairwise correlation as a FEATURE — the
    // blocked Gram expansion running inside calculate_features per
    // (class, window), oracle-gated with the same integer-moment closed
    // form as a12/a12c (exact BIGINT Σ's → bit-deterministic)
    GQuery(
      "e6_engine_correlation_feature",
      oracleCte +
        // NB: report time is DOUBLE here — `//` on DOUBLE is plain division
        // in DuckDB and CAST(...AS INT) would ROUND, so floor explicitly
        // (the a12 oracles divide BIGINT micros, where // already floors)
        s""", c AS (
           |  SELECT neuron_class, gid, CAST(FLOOR(time / $H) AS INT) AS bin, count(*) AS cnt
           |  FROM assigned WHERE win = 'w2' GROUP BY 1, 2, 3),
           |g AS (SELECT DISTINCT neuron_class, gid FROM c),
           |b AS (SELECT CAST(x AS INT) AS bin FROM generate_series(0, 167) AS t(x)),
           |dense AS (
           |  SELECT g.neuron_class, g.gid, b.bin, COALESCE(c.cnt, 0) AS cnt
           |  FROM g CROSS JOIN b
           |  LEFT JOIN c ON c.neuron_class = g.neuron_class AND c.gid = g.gid AND c.bin = b.bin),
           |stats AS (
           |  SELECT neuron_class, gid, sum(cnt) AS sx, sum(cnt * cnt) AS qx
           |  FROM dense GROUP BY 1, 2),
           |dots AS (
           |  SELECT d1.neuron_class, d1.gid AS gid1, d2.gid AS gid2,
           |    sum(d1.cnt * d2.cnt) AS sxy
           |  FROM dense d1 JOIN dense d2 ON d1.neuron_class = d2.neuron_class
           |    AND d1.bin = d2.bin AND d1.gid < d2.gid
           |  GROUP BY 1, 2, 3)
           |SELECT 0 AS simulation_id, 0 AS circuit_id, p.neuron_class, 'w2' AS window,
           |  p.gid1, p.gid2,
           |  CASE WHEN 168 * s1.qx - s1.sx * s1.sx > 0 AND 168 * s2.qx - s2.sx * s2.sx > 0
           |       THEN (168 * p.sxy - s1.sx * s2.sx)
           |            / sqrt(CAST(168 * s1.qx - s1.sx * s1.sx AS DOUBLE)
           |                 * CAST(168 * s2.qx - s2.sx * s2.sx AS DOUBLE))
           |  END AS r
           |FROM dots p
           |JOIN stats s1 ON s1.neuron_class = p.neuron_class AND s1.gid = p.gid1
           |JOIN stats s2 ON s2.neuron_class = p.neuron_class AND s2.gid = p.gid2""".stripMargin) { (s, dir) =>
      val cfg = SingleAnalysisConfig(
        name = "corr",
        reportType = "spikes",
        windows = Map("w2" -> WindowSpec(bounds = (0.0, 7.0 * D))),
        neuronClasses = Map(
          "even" -> NeuronClassSpec(query = QAnd("parity" -> QCond(QEq(0)))),
          "odd" -> NeuronClassSpec(query = QAnd("parity" -> QCond(QEq(1))))),
        features = Seq(
          FeaturesSpec(
            groupby = Seq("simulation_id", "circuit_id", "neuron_class", "window"),
            function = "pairwise_correlation",
            params = Map(
              "bin_size" -> H.toDouble, "n_bins" -> 168, "n_blocks" -> 8))))
      val campaign = Campaign(
        name = "testdata", pathPrefix = dir, attrs = Map.empty,
        rows = Seq(Map(
          "simulation_path" -> "events.parquet",
          "circuit_path" -> s"$dir/events.parquet")))
      new Analyzer(s, cfg, campaign, new EventsAdapter, QTrue, None)
        .calculateFeatures()("by_pair")
    },

    // A8 under the oracle: neuron_classes member counts through the facade
    // (reference: extract/neuron_classes.py:53-69). The `query` provenance
    // column is config-echo, not data — the gate pins the counts.
    GQuery(
      "e7_engine_class_counts",
      s"""WITH nodes AS (SELECT DISTINCT user_id AS gid FROM events)
         |SELECT 0 AS circuit_id,
         |  CASE WHEN gid % 2 = 0 THEN 'even' ELSE 'odd' END AS neuron_class,
         |  count(*) AS "count"
         |FROM nodes GROUP BY 2""".stripMargin) { (s, dir) =>
      analyzer(s, dir).neuronClasses
        .select("circuit_id", "neuron_class", "count")
    },

    // A9 under the oracle: the expanded windows/trials table through the
    // facade, with the invariant checks (unique bounds per window,
    // contiguous trials) actually run — a violation throws and lands in
    // errors.json rather than producing rows.
    GQuery(
      "e8_engine_windows",
      s"""SELECT * FROM (VALUES
         |  (0, 0, 'w1', 0, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(${12 * H} AS DOUBLE), CAST(${12 * H} AS DOUBLE)),
         |  (0, 0, 'w1', 1, CAST($D AS DOUBLE), CAST(0 AS DOUBLE), CAST(${12 * H} AS DOUBLE), CAST(${12 * H} AS DOUBLE)),
         |  (0, 0, 'w1', 2, CAST(${2 * D} AS DOUBLE), CAST(0 AS DOUBLE), CAST(${12 * H} AS DOUBLE), CAST(${12 * H} AS DOUBLE)),
         |  (0, 0, 'w2', 0, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(${7 * D} AS DOUBLE), CAST(${7 * D} AS DOUBLE))
         |) AS t(simulation_id, circuit_id, "window", trial, "offset", t_start, t_stop, duration)""".stripMargin) { (s, dir) =>
      val an = analyzer(s, dir)
      an.repo.validateWindows()
      an.windows
        .select("simulation_id", "circuit_id", "window", "trial", "offset",
          "t_start", "t_stop", "duration")
    },

    // J7 under the oracle: first-per-circuit dedupe — three simulations
    // over two distinct circuit paths must share circuit ids in
    // first-appearance order (reference: extract/neurons.py:135)
    GQuery(
      "e9_engine_sim_dedupe",
      """SELECT * FROM (VALUES
        |  (0, 0, CAST(1.1 AS DOUBLE)), (1, 0, CAST(1.2 AS DOUBLE)),
        |  (2, 1, CAST(1.3 AS DOUBLE))
        |) AS t(simulation_id, circuit_id, ca)""".stripMargin) { (s, dir) =>
      val campaign = Campaign(
        name = "dedupe", pathPrefix = dir, attrs = Map.empty,
        rows = Seq(
          Map("simulation_path" -> "events.parquet",
            "circuit_path" -> s"$dir/events.parquet", "ca" -> 1.1),
          Map("simulation_path" -> "events.parquet",
            "circuit_path" -> s"$dir/events.parquet", "ca" -> 1.2),
          Map("simulation_path" -> "events.parquet",
            "circuit_path" -> s"$dir/documents.parquet", "ca" -> 1.3)))
      val cfg = SingleAnalysisConfig(
        name = "dedupe", reportType = "spikes",
        windows = Map("w" -> WindowSpec(bounds = (0.0, 1.0))),
        neuronClasses = Map.empty, features = Nil)
      new Analyzer(s, cfg, campaign, new EventsAdapter, QTrue, None)
        .simulations.select("simulation_id", "circuit_id", "ca")
    },

    // P5 under the oracle: deterministic seeded class limit — the md5-rank
    // sample (SURVEY §7.4; np.random.choice is not distributively
    // reproducible) is replicated bit-for-bit by DuckDB's md5
    GQuery(
      "e10_engine_class_limit",
      s"""WITH nodes AS (SELECT DISTINCT user_id AS gid FROM events),
         |even AS (SELECT gid FROM nodes WHERE gid % 2 = 0),
         |lim AS (
         |  SELECT gid FROM even
         |  ORDER BY md5(CAST(gid AS VARCHAR) || ':0'), gid LIMIT 40)
         |SELECT 0 AS circuit_id, 'even' AS neuron_class, gid,
         |  row_number() OVER (ORDER BY gid) - 1 AS neuron_class_index
         |FROM lim""".stripMargin) { (s, dir) =>
      val cfg = SingleAnalysisConfig(
        name = "limit", reportType = "spikes",
        windows = Map("w" -> WindowSpec(bounds = (0.0, 1.0))),
        neuronClasses = Map(
          "even" -> NeuronClassSpec(
            query = QAnd("parity" -> QCond(QEq(0))), limit = Some(40))),
        features = Nil)
      val campaign = Campaign(
        name = "limit", pathPrefix = dir, attrs = Map.empty,
        rows = Seq(Map(
          "simulation_path" -> "events.parquet",
          "circuit_path" -> s"$dir/events.parquet")))
      new Analyzer(s, cfg, campaign, new EventsAdapter, QTrue, None).neurons
    },

    // C6 under the oracle: params_product expansion (two bin sizes) of the
    // histograms feature through the facade, re-united by the concat view
    // with the param as a column (reference: config/analysis.py:132-170 +
    // ConcatenatedFeatures, features.py:36-116)
    GQuery(
      "e11_engine_params_product",
      oracleCte +
        s""", w2 AS (SELECT neuron_class, time FROM assigned WHERE win = 'w2'),
           |cls AS (SELECT DISTINCT neuron_class FROM w2),
           |bs AS (SELECT CAST(${6 * H} AS DOUBLE) AS bin_size, 27 AS hi
           |       UNION ALL SELECT CAST(${12 * H} AS DOUBLE), 13),
           |bins AS (
           |  SELECT c.neuron_class, b.bin_size, CAST(x AS BIGINT) AS bin
           |  FROM cls c, bs b, LATERAL (SELECT unnest(generate_series(0, b.hi)) AS x)),
           |counts AS (
           |  SELECT w.neuron_class, b.bin_size,
           |    CAST(FLOOR(w.time / b.bin_size) AS BIGINT) AS bin, count(*) AS cnt
           |  FROM w2 w, (SELECT bin_size FROM bs) b
           |  GROUP BY 1, 2, 3)
           |SELECT 0 AS simulation_id, 0 AS circuit_id, g.neuron_class,
           |  'w2' AS window, g.bin, COALESCE(k.cnt, 0) AS cnt, g.bin_size
           |FROM bins g
           |LEFT JOIN counts k ON k.neuron_class = g.neuron_class
           |  AND k.bin_size = g.bin_size AND k.bin = g.bin""".stripMargin) { (s, dir) =>
      val base = FeaturesSpec(
        groupby = Seq("simulation_id", "circuit_id", "neuron_class", "window"),
        function = "histograms")
      val combos = FeatureExpansion.expand(
        base, product = Map("bin_size" -> Seq(6.0 * H, 12.0 * H)), zip = Map.empty)
      val cfg = SingleAnalysisConfig(
        name = "params", reportType = "spikes",
        windows = Map("w2" -> WindowSpec(bounds = (0.0, 7.0 * D))),
        neuronClasses = Map(
          "even" -> NeuronClassSpec(query = QAnd("parity" -> QCond(QEq(0)))),
          "odd" -> NeuronClassSpec(query = QAnd("parity" -> QCond(QEq(1))))),
        features = combos)
      val campaign = Campaign(
        name = "params", pathPrefix = dir, attrs = Map.empty,
        rows = Seq(Map(
          "simulation_path" -> "events.parquet",
          "circuit_path" -> s"$dir/events.parquet")))
      val outs = new Analyzer(s, cfg, campaign, new EventsAdapter, QTrue, None)
        .calculateFeatures()
      FeatureExpansion.concatView(
        combos.map(c => c.params -> outs(s"histograms${c.suffix}")))
    },

    // trial_steps_list windows + a named trial-steps function
    // (mean_first_spike): the full facade with explicit per-trial offsets
    // and a per-simulation dynamic offset, both replicated by the oracle
    GQuery(
      "e5_engine_trial_steps",
      s"""WITH spikes AS (
         |  SELECT CAST(epoch_us(ts) - $Origin AS DOUBLE) AS time, user_id AS gid FROM events),
         |nodes AS (SELECT DISTINCT gid FROM spikes),
         |classes AS (
         |  SELECT gid, CASE WHEN gid % 2 = 0 THEN 'even' ELSE 'odd' END AS neuron_class
         |  FROM nodes),
         |dyn AS (
         |  SELECT min(time) AS d FROM spikes
         |  WHERE time >= CAST(0 AS DOUBLE) AND time < CAST(${2 * H} AS DOUBLE)),
         |wins AS (
         |  SELECT * FROM (VALUES
         |    ('wlist', 0, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(${12 * H} AS DOUBLE)),
         |    ('wlist', 1, CAST(${D / 2} AS DOUBLE), CAST(0 AS DOUBLE), CAST(${12 * H} AS DOUBLE)),
         |    ('wlist', 2, CAST(${3 * D} AS DOUBLE), CAST(0 AS DOUBLE), CAST(${12 * H} AS DOUBLE))
         |  ) AS w(win, trial, w_offset, t_start, t_stop)
         |  UNION ALL
         |  SELECT 'wdyn', 0, (SELECT d FROM dyn), CAST(0 AS DOUBLE), CAST(${6 * H} AS DOUBLE))
         |SELECT 0 AS simulation_id, 0 AS circuit_id, c.neuron_class, w.win AS window,
         |  w.trial, s.time - w.w_offset AS time, s.gid
         |FROM spikes s
         |JOIN wins w ON s.time >= w.w_offset + w.t_start AND s.time < w.w_offset + w.t_stop
         |JOIN classes c ON c.gid = s.gid""".stripMargin) { (s, dir) =>
      val cfg = SingleAnalysisConfig(
        name = "trial-steps",
        reportType = "spikes",
        windows = Map(
          "wlist" -> WindowSpec(
            bounds = (0.0, 12.0 * H),
            trialStepsList = Seq(0.0, D / 2.0, 3.0 * D)),
          "wdyn" -> WindowSpec(
            bounds = (0.0, 6.0 * H), trialStepsLabel = "align")),
        neuronClasses = Map(
          "even" -> NeuronClassSpec(query = QAnd("parity" -> QCond(QEq(0)))),
          "odd" -> NeuronClassSpec(query = QAnd("parity" -> QCond(QEq(1))))),
        features = Nil,
        trialSteps = Map(
          "align" -> TrialStepsSpec(
            function = "mean_first_spike", bounds = (0.0, 2.0 * H))))
      val campaign = Campaign(
        name = "testdata", pathPrefix = dir, attrs = Map.empty,
        rows = Seq(Map(
          "simulation_path" -> "events.parquet",
          "circuit_path" -> s"$dir/events.parquet")))
      new Analyzer(s, cfg, campaign, new EventsAdapter, QTrue, None).report
    },

    // bnac by_neuron_class_and_trial: mean spike count over the gid
    // universe per (class, window, trial) — reference
    // mean_of_spike_counts_for_each_trial (calculate_features.py:38-44,160)
    GQuery(
      "e12_engine_class_trial_means",
      oracleCte +
        """, counts AS (
          |  SELECT neuron_class, win, trial, gid, count(*) AS cnt
          |  FROM assigned GROUP BY 1, 2, 3, 4)
          |SELECT 0 AS simulation_id, 0 AS circuit_id, c.neuron_class,
          |  w.win AS window, w.trial,
          |  CAST(SUM(CAST(COALESCE(k.cnt, 0) AS DECIMAL(20,6))) AS DOUBLE)
          |    / COUNT(*) AS mean_of_spike_counts
          |FROM classes c
          |CROSS JOIN wins w
          |LEFT JOIN counts k ON k.neuron_class = c.neuron_class AND k.win = w.win
          |  AND k.trial = w.trial AND k.gid = c.gid
          |GROUP BY c.neuron_class, w.win, w.trial""".stripMargin) { (s, dir) =>
      analyzer(s, dir).calculateFeatures()("by_neuron_class_and_trial")
    },

    // bnac by_gid_and_trial: per-trial count / first spike / sorted spike
    // list, spiking rows only (calculate_features.py:21-27,117-124). The
    // list is gate-compared as a comma-joined integer string (times are
    // integral micros; the harness cannot lexsort array cells).
    GQuery(
      "e15_engine_by_gid_trial",
      oracleCte +
        """SELECT 0 AS simulation_id, 0 AS circuit_id, neuron_class,
          |  win AS window, trial, gid, count(*) AS "count",
          |  min(time) AS first_spike,
          |  array_to_string(list(CAST(time AS BIGINT) ORDER BY time), ',') AS times
          |FROM assigned GROUP BY 1, 2, 3, 4, 5, 6""".stripMargin) { (s, dir) =>
      analyzer(s, dir).calculateFeatures()("by_gid_and_trial")
        .withColumn("times", array_join(
          transform(col("times"), _.cast("long").cast("string")), ","))
    },

    // bnac histograms frame: the normalized PSTH, its max-normalized form,
    // and the gaussian-smoothed max-normalized form (σ=4 bins, reflect
    // boundary; calculate_features.py:67-93,161-179). Smoothing the raw
    // counts and dividing by their max equals smoothing the normalized
    // hist (linearity), so the oracle smooths `hist` directly.
    GQuery(
      "e16_engine_hist_frame",
      oracleCte + histCte +
        s""", kernel AS (
           |  SELECT k, exp(-(k * k) / 32.0) / sum(exp(-(k * k) / 32.0)) OVER () AS w
           |  FROM generate_series(-16, 16) AS t(k)),
           |ext AS (SELECT neuron_class, win, max(bin) AS hi FROM hist GROUP BY 1, 2),
           |taps AS (
           |  -- scipy reflect via the closed form: fold idx into [0, hi]
           |  -- with period 2(hi+1) — exact when the radius exceeds the
           |  -- extent (w1 has 2 bins vs radius 16)
           |  SELECT d.neuron_class, d.win, d.bin, kk.w,
           |    CASE WHEN ((d.bin + kk.k) % (2 * (e.hi + 1)) + 2 * (e.hi + 1))
           |              % (2 * (e.hi + 1)) < e.hi + 1
           |         THEN ((d.bin + kk.k) % (2 * (e.hi + 1)) + 2 * (e.hi + 1))
           |              % (2 * (e.hi + 1))
           |         ELSE 2 * (e.hi + 1) - 1
           |              - ((d.bin + kk.k) % (2 * (e.hi + 1)) + 2 * (e.hi + 1))
           |                % (2 * (e.hi + 1)) END AS src_bin
           |  FROM hist d
           |  JOIN ext e ON e.neuron_class = d.neuron_class AND e.win = d.win
           |  CROSS JOIN kernel kk),
           |sm AS (
           |  SELECT t.neuron_class, t.win, t.bin,
           |    CAST(sum(src.hist * t.w) AS DOUBLE) AS smoothed
           |  FROM taps t
           |  JOIN hist src ON src.neuron_class = t.neuron_class AND src.win = t.win
           |    AND src.bin = t.src_bin
           |  GROUP BY 1, 2, 3),
           |mx AS (
           |  SELECT neuron_class, win, max(hist) AS mh FROM hist GROUP BY 1, 2),
           |smx AS (
           |  SELECT neuron_class, win, max(smoothed) AS ms FROM sm GROUP BY 1, 2)
           |SELECT 0 AS simulation_id, 0 AS circuit_id, h.neuron_class,
           |  h.win AS window, h.bin, h.hist,
           |  CASE WHEN mx.mh = 0 THEN h.hist ELSE h.hist / mx.mh END AS max_normalised_hist,
           |  CASE WHEN smx.ms = 0 THEN sm.smoothed ELSE sm.smoothed / smx.ms END
           |    AS smoothed_max_normalised_hist
           |FROM hist h
           |JOIN sm ON sm.neuron_class = h.neuron_class AND sm.win = h.win
           |  AND sm.bin = h.bin
           |JOIN mx ON mx.neuron_class = h.neuron_class AND mx.win = h.win
           |JOIN smx ON smx.neuron_class = h.neuron_class AND smx.win = h.win""".stripMargin) { (s, dir) =>
      analyzer(s, dir).calculateFeatures()("histograms")
    },

    // P7 under the oracle: applyFilter on a condition column — a 3-sim
    // campaign (identical events per sim, varying `ca`) rescoped in memory
    // to ca ∈ {1.1, 1.3}; the filtered by_gid features must equal the e1
    // computation replicated per selected simulation (reference:
    // analysis.py:126-145 apply_filter / repository.py:383-418)
    GQuery(
      "e13_engine_apply_filter",
      oracleCte +
        """, counts AS (
          |  SELECT neuron_class, win, trial, gid, count(*) AS cnt, min(time) AS first_spike
          |  FROM assigned GROUP BY 1, 2, 3, 4),
          |by_gid AS (
          |  SELECT 0 AS circuit_id, c.neuron_class, w.win AS window, c.gid,
          |    avg(COALESCE(k.cnt, 0)) AS mean_count,
          |    avg(k.first_spike) AS mean_first_spike,
          |    avg(COALESCE(k.cnt, 0)) * 1000.0 / w.duration AS mean_firing_rate
          |  FROM classes c
          |  CROSS JOIN wins w
          |  LEFT JOIN counts k ON k.neuron_class = c.neuron_class AND k.win = w.win
          |    AND k.trial = w.trial AND k.gid = c.gid
          |  GROUP BY c.neuron_class, w.win, c.gid, w.duration)
          |SELECT s.sim AS simulation_id, b.*
          |FROM (VALUES (0), (2)) s(sim) CROSS JOIN by_gid b""".stripMargin) { (s, dir) =>
      val an = multiSimAnalyzer(s, dir, withFeatures = true)
      an.applyFilter(QAnd("ca" -> QCond(QIsIn(Seq(1.1, 1.3)))))
        .calculateFeatures()("by_gid")
    },

    // P8/C3 under the oracle: a cache written under the broad (true)
    // filter is reused by a NARROWER filter and refiltered at load — the
    // served report must equal the narrow extraction directly (reference:
    // cache.py:575-610 _is_subfilter reuse)
    GQuery(
      "e14_engine_cache_narrowing",
      oracleCte +
        """SELECT 2 AS simulation_id, 0 AS circuit_id, neuron_class,
          |  win AS window, trial, time, gid
          |FROM assigned WHERE win = 'w1'""".stripMargin) { (s, dir) =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-e14").toString
      // w1-only: the reuse semantics under test don't need the 7-day
      // window's row volume in the cache write this gate pays per run
      val cfg = multiSimCfg(withFeatures = false)
      val w1cfg = cfg.copy(windows = cfg.windows.filter(_._1 == "w1"))
      val broad = new Analyzer(s, w1cfg,
        multiSimCampaign(dir), new EventsAdapter, QTrue,
        Some(new CacheManager(s, tmp)))
      broad.extractRepo()
      broad.cache.foreach(_.close())
      val narrow = new Analyzer(s, w1cfg,
        multiSimCampaign(dir), new EventsAdapter,
        QAnd("ca" -> QCond(QEq(1.3))), Some(new CacheManager(s, tmp)))
      // reuse proof, not just result equality: the narrow analyzer must
      // serve the broad cache (subfilter reuse), not recompute
      val plan = narrow.report.queryExecution.optimizedPlan.toString
      require(!plan.toLowerCase.contains("join"),
        s"expected cached-scan reuse, got a recomputation plan:\n$plan")
      narrow.report
        .select("simulation_id", "circuit_id", "neuron_class", "window",
          "trial", "time", "gid")
    },

    // S4 under the oracle: COMPARTMENT report extraction — the frame
    // variant carrying a per-compartment `section` id through extraction
    // and aggregation (reference: extract/compartment_report.py:42-48,
    // functional config analysis_config_06). Sections synthesized
    // deterministically (event_id % 3) so DuckDB replicates them; stats
    // grouped by (class, window, section) exercise the one extraction
    // column the soma gate (e4) never sees.
    GQuery(
      "e17_engine_compartment_stats",
      s"""WITH frames AS (
         |  SELECT CAST(epoch_us(ts) - $Origin AS DOUBLE) AS time, user_id AS gid,
         |    value, event_id % 3 AS section FROM events),
         |classes AS (
         |  SELECT gid, CASE WHEN gid % 2 = 0 THEN 'even' ELSE 'odd' END AS neuron_class
         |  FROM (SELECT DISTINCT gid FROM frames)),
         |wins AS (
         |  SELECT * FROM (VALUES
         |    ('w1', 0, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(${12 * H} AS DOUBLE)),
         |    ('w1', 1, CAST($D AS DOUBLE), CAST(0 AS DOUBLE), CAST(${12 * H} AS DOUBLE)),
         |    ('w1', 2, CAST(${2 * D} AS DOUBLE), CAST(0 AS DOUBLE), CAST(${12 * H} AS DOUBLE)),
         |    ('w2', 0, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(${7 * D} AS DOUBLE))
         |  ) AS w(win, trial, w_offset, t_start, t_stop))
         |SELECT 0 AS simulation_id, 0 AS circuit_id, c.neuron_class, w.win AS window,
         |  f.section,
         |  avg(f.value) AS mean, stddev_samp(f.value) AS std,
         |  min(f.value) AS min, max(f.value) AS max
         |FROM frames f
         |JOIN wins w ON f.time >= w.w_offset + w.t_start AND f.time < w.w_offset + w.t_stop
         |JOIN classes c ON c.gid = f.gid
         |GROUP BY c.neuron_class, w.win, f.section""".stripMargin) { (s, dir) =>
      val cfg = SingleAnalysisConfig(
        name = "compartment",
        reportType = "compartment",
        windows = Map(
          "w1" -> WindowSpec(
            bounds = (0.0, 12.0 * H), nTrials = 3, trialStepsValue = D.toDouble),
          "w2" -> WindowSpec(bounds = (0.0, 7.0 * D))),
        neuronClasses = Map(
          "even" -> NeuronClassSpec(query = QAnd("parity" -> QCond(QEq(0)))),
          "odd" -> NeuronClassSpec(query = QAnd("parity" -> QCond(QEq(1))))),
        features = Seq(
          FeaturesSpec(
            groupby = Seq("simulation_id", "circuit_id", "neuron_class",
              "window", "section"),
            function = "soma_stats")))
      val campaign = Campaign(
        name = "testdata", pathPrefix = dir, attrs = Map.empty,
        rows = Seq(Map(
          "simulation_path" -> "events.parquet",
          "circuit_path" -> s"$dir/events.parquet")))
      new Analyzer(s, cfg, campaign, new CompartmentEventsAdapter, QTrue, None)
        .calculateFeatures()("by_group")
    },

    // The YAML front door under the oracle: ConfigIO.loadAnalysis →
    // MultiAnalyzer.fromFile → the e1 by_gid pipeline, configs parsed
    // from files on disk, not constructed in Scala (reference:
    // apps/run.py:35-77 + config/analysis.py:198-210). This closes the
    // parse→plan→execute seam the Scala-constructed e-gates never cross.
    GQuery(
      "e18_engine_yaml_front_door",
      oracleCte +
        """, counts AS (
          |  SELECT neuron_class, win, trial, gid, count(*) AS cnt, min(time) AS first_spike
          |  FROM assigned GROUP BY 1, 2, 3, 4)
          |SELECT 0 AS simulation_id, 0 AS circuit_id, c.neuron_class, w.win AS window, c.gid,
          |  avg(COALESCE(k.cnt, 0)) AS mean_count,
          |  avg(k.first_spike) AS mean_first_spike,
          |  avg(COALESCE(k.cnt, 0)) * 1000.0 / w.duration AS mean_firing_rate
          |FROM classes c
          |CROSS JOIN wins w
          |LEFT JOIN counts k ON k.neuron_class = c.neuron_class AND k.win = w.win
          |  AND k.trial = w.trial AND k.gid = c.gid
          |GROUP BY c.neuron_class, w.win, c.gid, w.duration""".stripMargin) { (s, dir) =>
      import java.nio.file.{Files, Paths}
      val tmp = Files.createTempDirectory("graft-e18")
      Files.write(tmp.resolve("campaign.yaml"),
        s"""name: yaml-front-door
           |attrs:
           |  path_prefix: $dir
           |data:
           |  - {simulation_path: events.parquet, circuit_path: $dir/events.parquet}
           |""".stripMargin.getBytes("UTF-8"))
      Files.write(tmp.resolve("analysis.yaml"),
        s"""simulation_campaign: ${tmp.resolve("campaign.yaml")}
           |analysis:
           |  spikes:
           |    extraction:
           |      report: {type: spikes}
           |      neuron_classes:
           |        even: {query: {parity: 0}}
           |        odd: {query: {parity: 1}}
           |      windows:
           |        w1: {bounds: [0, ${12 * H}], n_trials: 3, trial_steps_value: $D}
           |        w2: {bounds: [0, ${7 * D}]}
           |    features:
           |      - groupby: [simulation_id, circuit_id, neuron_class, window]
           |        function: mean_firing_rates
           |        params: {hist_bin_size: ${6.0 * H}, sigma: 4.0}
           |""".stripMargin.getBytes("UTF-8"))
      // fromFile parses both YAMLs eagerly and the returned plans read
      // only the data dir, so the config dir can be reaped immediately —
      // repeated bench/verify passes must not accumulate /tmp dirs.
      try
        MultiAnalyzer.fromFile(s, tmp.resolve("analysis.yaml").toString,
            new EventsAdapter, useCache = false)("spikes")
          .calculateFeatures()("by_gid")
      finally MultiAnalyzer.deleteRecursively(tmp.toFile)
    }
  )

  /** 3-simulation campaign over the same events table with a varying `ca`
    * condition column (simulation ids 0/1/2 by row order).
    */
  private def multiSimCampaign(dir: String): Campaign = Campaign(
    name = "multisim", pathPrefix = dir, attrs = Map.empty,
    rows = Seq(1.1, 1.2, 1.3).map(ca => Map[String, Any](
      "simulation_path" -> "events.parquet",
      "circuit_path" -> s"$dir/events.parquet", "ca" -> ca)))

  private def multiSimCfg(withFeatures: Boolean): SingleAnalysisConfig =
    SingleAnalysisConfig(
      name = "multisim", reportType = "spikes",
      windows = Map(
        "w1" -> WindowSpec(
          bounds = (0.0, 12.0 * H), nTrials = 3, trialStepsValue = D.toDouble),
        "w2" -> WindowSpec(bounds = (0.0, 7.0 * D))),
      neuronClasses = Map(
        "even" -> NeuronClassSpec(query = QAnd("parity" -> QCond(QEq(0)))),
        "odd" -> NeuronClassSpec(query = QAnd("parity" -> QCond(QEq(1))))),
      features = if (withFeatures) Seq(
        FeaturesSpec(
          groupby = Seq("simulation_id", "circuit_id", "neuron_class", "window"),
          function = "mean_firing_rates",
          params = Map("hist_bin_size" -> (6.0 * H), "sigma" -> 4.0))) else Nil)

  private def multiSimAnalyzer(s: SparkSession, dir: String,
      withFeatures: Boolean): Analyzer =
    new Analyzer(s, multiSimCfg(withFeatures), multiSimCampaign(dir),
      new EventsAdapter, QTrue, None)
}
