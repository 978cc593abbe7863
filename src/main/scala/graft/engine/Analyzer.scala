package graft.engine

import graft.dsl.{Q, QSpec, QTrue}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One analysis: extraction repository + features, with write-through
  * caching and dependency-ordered invalidation
  * (reference facade: src/blueetl/analysis.py:24-326 Analyzer).
  */
final class Analyzer(
    val spark: SparkSession,
    val cfg: SingleAnalysisConfig,
    val campaign: Campaign,
    val adapter: DataAdapter,
    val simulationsFilter: QSpec = QTrue,
    val cache: Option[CacheManager] = None) {

  val repo = new Repository(spark, campaign, cfg, adapter, simulationsFilter)

  private val baseChain: String =
    ConfigIO.checksum(Describe.analysis(cfg, campaign))
  private val filterSum: String =
    ConfigIO.checksum(Describe.spec(simulationsFilter))

  /** Chained checksum per extraction name: base config + the dependency
    * prefix, so upstream edits invalidate downstream (C2). The
    * simulations filter participates so a *different* (non-narrower)
    * filter rebuilds (C3 is handled by callers via
    * [[CacheManager.filterReusable]]; here the conservative key).
    */
  private def chain(name: String): String = {
    val idx = Repository.Names.indexOf(name)
    ConfigIO.checksum(Seq(baseChain, filterSum) ++ Repository.Names.take(idx + 1))
  }

  /** Extraction accessor, cached when a cache manager is attached. */
  def df(name: String): DataFrame = cache match {
    case Some(cm) => cm.loadOrCompute("repo", name, chain(name), repo.df(name))
    case None => repo.df(name)
  }

  def simulations: DataFrame = df("simulations")
  def neurons: DataFrame = df("neurons")
  def neuronClasses: DataFrame = df("neuron_classes")
  def windows: DataFrame = df("windows")
  def report: DataFrame = df("report")

  def extractRepo(): Unit = Repository.Names.foreach(df)

  /** Scope the report to a features spec's windows/neuron_classes (P6 —
    * reference: features.py:473-515 `_filter_by_value`).
    */
  private def scoped(spec: FeaturesSpec): DataFrame = {
    var r = report
    if (spec.windows.nonEmpty) r = r.filter(col("window").isin(spec.windows: _*))
    if (spec.neuronClasses.nonEmpty)
      r = r.filter(col("neuron_class").isin(spec.neuronClasses: _*))
    r
  }

  /** Compute all configured features: map of `<fnOutput><suffix>` →
    * DataFrame (reference: features.py:233-305). Cached per feature-config
    * checksum (C2's per-FeaturesConfig keys, cache.py:378-382).
    */
  def calculateFeatures(): Map[String, DataFrame] =
    cfg.features.flatMap { spec =>
      val fn = FeatureFns.resolve(spec.function)
      val ctx = FeatureCtx(
        spark, spec.groupby, spec.params, scoped(spec), windows, neurons, neuronClasses)
      val outs = fn.compute(ctx)
      val specSum = ConfigIO.checksum(Seq(chain("report"), Describe.features(spec)))
      outs.map { case (outName, outDf) =>
        val name = s"$outName${spec.suffix}"
        val result = cache match {
          case Some(cm) => cm.loadOrCompute("features", name, specSum, outDf)
          case None => outDf
        }
        name -> result
      }
    }.toMap

  /** In-memory re-scope (P7 — reference: analysis.py:126-145 apply_filter):
    * a new Analyzer whose five frames and features are filtered by the
    * simulation ids selected by `extra`, never written to cache.
    */
  def applyFilter(extra: QSpec): FilteredAnalyzer = {
    val ids = Q.q(simulations, extra)
      .select("simulation_id").collect().map(_.getInt(0)).toSeq
    new FilteredAnalyzer(this, ids)
  }
}

/** Result of applyFilter: same surface, frames filtered by simulation_id
  * (reference: repository.py:383-418 FilteredRepository).
  */
final class FilteredAnalyzer(base: Analyzer, simIds: Seq[Int]) {
  private def f(df: DataFrame): DataFrame =
    df.filter(col("simulation_id").isin(simIds: _*))
  def simulations: DataFrame = f(base.simulations)
  def neurons: DataFrame = base.neurons // circuit-level, no simulation_id
  def neuronClasses: DataFrame = base.neuronClasses
  def windows: DataFrame = f(base.windows)
  def report: DataFrame = f(base.report)
  def calculateFeatures(): Map[String, DataFrame] =
    base.calculateFeatures().map { case (k, v) =>
      k -> (if (v.columns.contains("simulation_id")) f(v) else v)
    }
}

/** Multi-analysis facade (reference: analysis.py MultiAnalyzer +
  * run_from_file): loads config + campaign, builds one Analyzer per
  * configured analysis, with optional caching under `<output>/<name>`.
  */
final class MultiAnalyzer(
    val spark: SparkSession,
    val config: MultiAnalysisConfig,
    val adapter: DataAdapter,
    val useCache: Boolean = true) {

  val analyzers: Map[String, Analyzer] = {
    val campaign = ConfigIO.loadCampaign(config.campaignPath)
    val resolved = MultiAnalyzer.resolveWindowRefs(config.analyses)
    resolved.map { a =>
      val cm =
        if (useCache && config.output.nonEmpty)
          Some(new CacheManager(spark, s"${config.output}/${a.name}"))
        else None
      a.name -> new Analyzer(spark, a, campaign, adapter, config.simulationsFilter, cm)
    }.toMap
  }

  def apply(name: String): Analyzer = analyzers(name)
  def extractRepo(): Unit = analyzers.values.foreach(_.extractRepo())
  def calculateFeatures(): Map[String, Map[String, DataFrame]] =
    analyzers.map { case (n, a) => n -> a.calculateFeatures() }
  def close(): Unit = analyzers.values.foreach(_.cache.foreach(_.close()))
}

object MultiAnalyzer {
  def fromFile(spark: SparkSession, path: String, adapter: DataAdapter = new ParquetAdapter,
      useCache: Boolean = true): MultiAnalyzer =
    new MultiAnalyzer(spark, ConfigIO.loadAnalysis(path), adapter, useCache)

  /** Resolve cross-analysis window references (C7 — reference:
    * src/blueetl/config/analysis.py:68-129): a window declared as the
    * string `"<analysis>.extraction.windows.<window>"` becomes a copy of
    * the referenced spec. The analyses must form a DAG (topological
    * resolution; cycles rejected).
    */
  def resolveWindowRefs(analyses: Seq[SingleAnalysisConfig]): Seq[SingleAnalysisConfig] = {
    val byName = analyses.map(a => a.name -> a).toMap
    val resolving = scala.collection.mutable.Set.empty[String]
    val done = scala.collection.mutable.Map.empty[String, SingleAnalysisConfig]
    def resolve(name: String): SingleAnalysisConfig = done.getOrElseUpdate(name, {
      require(resolving.add(name), s"window reference cycle through '$name'")
      val a = byName(name)
      val extra = a.windowRefs.map { case (wn, ref) =>
        val parts = ref.split('.')
        require(parts.length >= 2, s"bad window reference '$ref'")
        val (srcAnalysis, srcWindow) = (parts.head, parts.last)
        val src = resolve(srcAnalysis)
        wn -> src.windows.getOrElse(srcWindow,
          throw new IllegalArgumentException(
            s"window reference '$ref': no window '$srcWindow' in analysis '$srcAnalysis'"))
      }
      resolving.remove(name)
      a.copy(windows = a.windows ++ extra, windowRefs = Map.empty)
    })
    analyses.map(a => resolve(a.name))
  }
}
