package graft.engine

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import graft.dsl.{Q, QSpec, QTrue}
import java.nio.file.{Files, Paths}

/** Configuration model of the analysis engine — the blueetl analysis config
  * surface (reference: src/blueetl/config/analysis_model.py:19-251,
  * schemas/analysis_config.yaml) re-expressed as case classes with a
  * YAML/JSON front-end. Pure driver-side code, no Spark dependency.
  */

/** One analysis window family: bounds relative to an offset, with optional
  * repeated trials (reference: src/blueetl/extract/windows.py:166-217 —
  * trial k starts at initial_offset + k*trial_steps_value, or at
  * initial_offset + trial_steps_list(k) when the explicit list is given).
  * `trialStepsLabel` references a named [[TrialStepsSpec]] whose function
  * adds a per-simulation dynamic offset to every trial
  * (reference: config/analysis_model.py:82-100, extract/windows.py:168-187).
  */
final case class WindowSpec(
    bounds: (Double, Double),
    initialOffset: Double = 0.0,
    nTrials: Int = 1,
    trialStepsValue: Double = 0.0,
    windowType: String = "",
    /** Frame-report subsampling step (S3 — reference:
      * extract/soma_report.py:42-45 `t_step`); 0 = keep every sample.
      */
    tStep: Double = 0.0,
    trialStepsList: Seq[Double] = Nil,
    trialStepsLabel: String = "") {
  require(nTrials >= 1, "n_trials >= 1")
  // reference validation rules (analysis_model.py:92-99)
  require(
    trialStepsList.isEmpty || (nTrials == 1 && trialStepsValue == 0.0),
    "trial_steps_list cannot be set with n_trials or trial_steps_value")
  require(
    nTrials <= 1 || trialStepsValue != 0.0,
    "trial_steps_value cannot be 0 when n_trials > 1")
  def duration: Double = bounds._2 - bounds._1
  /** Per-trial offsets relative to initial_offset, list taking precedence
    * (reference: extract/windows.py:176-179).
    */
  def stepOffsets: Seq[Double] =
    if (trialStepsList.nonEmpty) trialStepsList
    else (0 until nTrials).map(_ * trialStepsValue)
}

/** A named trial-steps computation (reference: analysis_model.py:102-127
  * TrialStepsConfig): `function` resolves to a [[TrialStepsFn]] computing a
  * per-simulation dynamic offset from the spikes inside `bounds`, optionally
  * scoped to a node set / deterministic limit. Extra keys land in `params`
  * for the function (`initial_offset` is forbidden, as in the reference).
  */
final case class TrialStepsSpec(
    function: String,
    bounds: (Double, Double),
    nodeSet: Option[String] = None,
    limit: Option[Int] = None,
    params: Map[String, Any] = Map.empty)

/** A neuron class: a P1 filter over node properties, optional explicit id
  * intersection, optional deterministic sample limit
  * (reference: src/blueetl/extract/neurons.py:62-96).
  */
final case class NeuronClassSpec(
    query: QSpec = QTrue,
    nodeId: Option[Seq[Long]] = None,
    limit: Option[Int] = None,
    /** Scope the class to a named node set (S6). */
    nodeSet: Option[String] = None)

/** One features computation: a registered function applied over groups of
  * the merged (neurons × windows × report) frame
  * (reference: src/blueetl/config/analysis_model.py:165-179).
  */
final case class FeaturesSpec(
    groupby: Seq[String],
    function: String,
    params: Map[String, Any] = Map.empty,
    windows: Seq[String] = Nil,
    neuronClasses: Seq[String] = Nil,
    suffix: String = "")

/** One analysis (one report) within the multi-analysis config. */
final case class SingleAnalysisConfig(
    name: String,
    reportType: String, // "spikes" | "soma" | "compartment"
    windows: Map[String, WindowSpec],
    neuronClasses: Map[String, NeuronClassSpec],
    features: Seq[FeaturesSpec],
    limit: Option[Int] = None,
    seed: Long = 0L,
    /** Cross-analysis window references `"<analysis>.extraction.windows.<name>"`
      * resolved by MultiAnalyzer before extraction (reference:
      * src/blueetl/extract/windows.py:147-163, resolver.py:13-72).
      */
    windowRefs: Map[String, String] = Map.empty,
    /** Extra node-sets JSON file merged over the circuit's own (S6). */
    nodeSetsFile: Option[String] = None,
    /** Named trial-steps configs referenced by window trial_steps_label. */
    trialSteps: Map[String, TrialStepsSpec] = Map.empty,
    /** Free-form user parameters (reference: `custom` dict on
      * SingleAnalysisConfig) — carried for user feature/trial-steps code.
      */
    custom: Map[String, Any] = Map.empty)

/** The `cache:` block (reference: analysis_model.py:57-71 CacheConfig).
  * `storeType` selects the on-disk frame format: parquet (default,
  * dataset-scale), feather (Arrow IPC — the reference's
  * store/feather.py, interoperable with an existing blueetl cache), or
  * hdf (pandas-HDFStore fixed format — store/hdf.py).
  */
final case class CacheSettings(
    path: String = "",
    clear: Boolean = false,
    readonly: Boolean = false,
    skipFeatures: Boolean = false,
    storeType: String = "parquet",
    /** Engine extension (no reference equivalent): when > 0 the cached
      * report frame is written hash-clustered into this many buckets on
      * `gid` ([[graft.sources.Bucketed]]), so every window × class join
      * against the neuron table runs exchange-free across reloads — the
      * 100 TB campaign-cache layout. Parquet store only.
      */
    bucketGids: Int = 0) {
  require(!(clear && readonly), "clear and readonly cannot be both True at the same time")
  require(storeType == "parquet" || storeType == "feather" || storeType == "hdf",
    s"store_type must be parquet, feather, or hdf, got $storeType")
  require(bucketGids >= 0, s"bucket_gids must be >= 0, got $bucketGids")
  require(bucketGids == 0 || storeType == "parquet",
    "bucket_gids requires the parquet store")
}

final case class MultiAnalysisConfig(
    campaignPath: String,
    output: String,
    simulationsFilter: QSpec,
    analyses: Seq[SingleAnalysisConfig],
    /** The `simulations_filter_in_memory` key: applied by
      * MultiAnalyzer.applyFilter() without touching the cache
      * (reference: analysis.py:126-145, config key in
      * schemas/analysis_config.yaml).
      */
    simulationsFilterInMemory: QSpec = QTrue,
    cacheSettings: CacheSettings = CacheSettings()) {
  /** Effective cache root: `cache.path` wins over the deprecated `output`
    * (reference deprecates output in favor of cache.path).
    */
  def cacheRoot: String = if (cacheSettings.path.nonEmpty) cacheSettings.path else output
}

/** A simulation campaign: the flat table of conditions + simulation paths
  * (reference: src/blueetl/campaign/config.py:164-239 — both the native
  * "blueetl" dict format and the xarray-converted form reduce to this).
  */
final case class Campaign(
    name: String,
    pathPrefix: String,
    attrs: Map[String, Any],
    rows: Seq[Map[String, Any]]) {
  /** Absolute simulation paths. Excluded sims (empty path) and remote URLs
    * are kept verbatim, never prefixed (reference:
    * campaign/config.py:23-32 — "do not convert excluded simulations").
    */
  def resolvedPaths: Seq[String] = rows.map { r =>
    val p = r.getOrElse("simulation_path", "").toString
    if (p.isEmpty || p.startsWith("https://") || p.startsWith("/") || pathPrefix.isEmpty) p
    else s"$pathPrefix/$p"
  }
}

object ConfigIO {
  private val yaml = new ObjectMapper(new YAMLFactory()).registerModule(DefaultScalaModule)
  private val json = new ObjectMapper().registerModule(DefaultScalaModule)

  /** .json parses with the JSON reader (JSON allows raw TABs, YAML does
    * not — real simulator configs contain them); everything else as YAML
    * (a JSON superset for well-formed documents).
    */
  def loadMap(path: String): Map[String, Any] = {
    val txt = Files.readString(Paths.get(path))
    val mapper = if (path.endsWith(".json")) json else yaml
    // parse untyped (Jackson keeps document field order in its
    // LinkedHashMaps) and convert to insertion-ordered Scala maps: the
    // Scala module's Map deserializer hands back a HashMap for >4 keys,
    // which would scramble order-sensitive config like params_product —
    // the reference's per-key `_i` suffixes follow YAML key order
    // (Python dicts preserve it)
    toOrderedScala(mapper.readValue(txt, classOf[Object]))
      .asInstanceOf[Map[String, Any]]
  }

  private def toOrderedScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      val b = scala.collection.immutable.ListMap.newBuilder[String, Any]
      m.forEach((k, vv) => b += (String.valueOf(k) -> toOrderedScala(vv)))
      b.result()
    case l: java.util.List[_] =>
      val b = List.newBuilder[Any]
      l.forEach(e => b += toOrderedScala(e))
      b.result()
    case other => other
  }

  def dumpYaml(path: String, v: Any): Unit =
    Files.writeString(Paths.get(path), yaml.writeValueAsString(v))

  /** Canonical JSON for checksums (sorted keys, stable scalars). */
  def canonical(v: Any): String = v match {
    case m: Map[_, _] =>
      m.toSeq.map { case (k, x) => s""""$k":${canonical(x)}""" }.sorted.mkString("{", ",", "}")
    case s: Seq[_] => s.map(canonical).mkString("[", ",", "]")
    case null => "null"
    case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case other => other.toString
  }

  def checksum(v: Any): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(canonical(v).getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Load a campaign file in either supported format (reference:
    * campaign/config.py:164-186): the native "blueetl" row format
    * (`data:` = list of condition dicts), or the xarray-dict format
    * exported by campaign-generation workflows — detected, as in the
    * reference, by its exact key set {name, attrs, data, dims, coords}.
    */
  def loadCampaign(path: String): Campaign = {
    val m = loadMap(path)
    if (m.keySet == Set("name", "attrs", "data", "dims", "coords")) xarrayCampaign(m)
    else {
      val attrs = m.getOrElse("attrs", Map.empty[String, Any]).asInstanceOf[Map[String, Any]]
      Campaign(
        name = m.getOrElse("name", "").toString,
        pathPrefix = attrs.getOrElse("path_prefix", m.getOrElse("path_prefix", "")).toString,
        attrs = attrs,
        rows = m.getOrElse("data", Seq.empty[Any]).asInstanceOf[Seq[Any]]
          .map(_.asInstanceOf[Map[String, Any]]))
    }
  }

  /** The xarray-dict campaign (reference: campaign/config.py:208-267).
    * Two coordinate layouts exist:
    *
    *  - PRODUCT (GenerateSimulationCampaign): every dim has its own
    *    dimension coordinate; simulations are the row-major cartesian
    *    product of the coordinate values and `data` is the equally-shaped
    *    nested list of paths (missing/excluded cells are empty).
    *  - COUPLED (GenerateCoupledCoordsSimulationCampaign): one synthetic
    *    dim (e.g. "coupled"); the condition coordinates are NON-dimension
    *    coords all varying along it, and `data` is the flat path list —
    *    row i takes coord value i of every condition. Marked with
    *    `__coupled__` in attrs, like the reference, for round-tripping.
    *
    * Unlike the reference we do not append a simulator config filename to
    * each path: graft adapters take the simulation root path directly
    * (the filename is simulator-format-specific, adapters/base.py).
    */
  private def xarrayCampaign(m: Map[String, Any]): Campaign = {
    val attrs = m.getOrElse("attrs", Map.empty[String, Any]).asInstanceOf[Map[String, Any]]
    val dims = m.getOrElse("dims", Seq.empty[Any]).asInstanceOf[Seq[Any]].map(_.toString)
    val coords = m.getOrElse("coords", Map.empty[String, Any]).asInstanceOf[Map[String, Any]]
      .map { case (k, v) =>
        val cm = v.asInstanceOf[Map[String, Any]]
        k -> cm.getOrElse("data", Seq.empty[Any]).asInstanceOf[Seq[Any]]
      }
    def leafPath(v: Any): String = Option(v).map(_.toString).getOrElse("")
    def flatten(v: Any): Seq[Any] = v match {
      case s: Seq[_] => s.flatMap(flatten)
      case other => Seq(other)
    }
    val nonDimCoords = coords.view.filterKeys(!dims.contains(_)).toSeq.sortBy(_._1)
    val rows: Seq[Map[String, Any]] =
      if (nonDimCoords.nonEmpty) {
        // coupled: one row per entry of the single dim
        val paths = flatten(m.getOrElse("data", Seq.empty[Any]))
        paths.indices.map { i =>
          nonDimCoords.map { case (k, vs) => k -> vs(i) }.toMap +
            ("simulation_path" -> leafPath(paths(i)))
        }
      } else {
        // product: row-major cartesian of the dimension coordinates (last
        // dim varies fastest), matching the C-order flatten of `data`
        val axes = dims.map(d => coords.getOrElse(d, Seq.empty))
        val combos = axes.foldLeft(Seq(Seq.empty[Any]))((acc, ax) =>
          acc.flatMap(c => ax.map(c :+ _)))
        val paths = flatten(m.getOrElse("data", Seq.empty[Any]))
        require(paths.length == combos.length,
          s"xarray campaign: data has ${paths.length} cells but coords imply ${combos.length}")
        combos.zip(paths).map { case (cond, p) =>
          dims.zip(cond).toMap + ("simulation_path" -> leafPath(p))
        }
      }
    val outAttrs =
      if (nonDimCoords.nonEmpty) attrs + ("__coupled__" -> dims.headOption.getOrElse("coupled"))
      else attrs
    Campaign(
      name = m.getOrElse("name", "").toString,
      pathPrefix = attrs.getOrElse("path_prefix", "").toString,
      attrs = outAttrs,
      rows = rows)
  }

  /** Campaign → xarray-dict write-back (reference: campaign/config.py:
    * 241-271, `to_xarray`/`to_xarray_dict`) — the inverse of
    * [[xarrayCampaign]]. A campaign whose attrs carry `__coupled__` emits
    * the coupled layout (one synthetic dim, conditions as non-dimension
    * coords, flat path list); otherwise the product layout (one dim per
    * condition with ascending coordinate values — xarray's
    * `DataArray.from_series` ordering — and the row-major nested path
    * array, `null` in cells no row covers).
    */
  def campaignToXarrayDict(c: Campaign): Map[String, Any] = {
    val condNames = c.rows.flatMap(_.keys).distinct
      .filterNot(_ == "simulation_path").sorted
    val attrsOut =
      (if (c.pathPrefix.nonEmpty) c.attrs + ("path_prefix" -> c.pathPrefix)
       else c.attrs) - "__coupled__"
    def path(r: Map[String, Any]): Any = r.getOrElse("simulation_path", "")
    c.attrs.get("__coupled__").map(_.toString) match {
      case Some(dim) =>
        Map(
          "name" -> c.name,
          "attrs" -> attrsOut,
          "dims" -> Seq(dim),
          "coords" -> condNames.map(k => k -> Map(
            "dims" -> Seq(dim),
            "attrs" -> Map.empty[String, Any],
            "data" -> c.rows.map(_.getOrElse(k, null)))).toMap,
          "data" -> c.rows.map(path))
      case None =>
        // the product layout can only represent rows that carry EVERY
        // condition and appear at most once per combo — refuse ragged or
        // duplicated campaigns loudly rather than silently dropping
        // simulations from the dump
        for (r <- c.rows; k <- condNames)
          require(r.get(k).exists(_ != null),
            s"xarray product dump: row $r lacks condition '$k' — " +
              "ragged campaigns have no xarray representation")
        val comboKeys = c.rows.map(r => condNames.map(r(_)))
        require(comboKeys.distinct.length == comboKeys.length,
          "xarray product dump: duplicate condition combinations")
        // ascending per-axis values; numbers before strings, numerically
        val ord: Ordering[Any] = Ordering.by {
          case n: Number => (0, n.doubleValue(), "")
          case other => (1, 0.0, String.valueOf(other))
        }
        val axes: Seq[(String, Seq[Any])] = condNames.map { k =>
          k -> c.rows.flatMap(_.get(k)).distinct.sorted(ord)
        }
        val byCombo: Map[Seq[Any], Any] =
          c.rows.map(r => condNames.map(k => r.getOrElse(k, null)) -> path(r)).toMap
        // nested row-major array: last dim varies fastest
        def nest(prefix: Seq[Any], rest: Seq[Seq[Any]]): Any = rest match {
          case Nil => byCombo.getOrElse(prefix, null)
          case ax +: tail => ax.map(v => nest(prefix :+ v, tail))
        }
        Map(
          "name" -> c.name,
          "attrs" -> attrsOut,
          "dims" -> condNames,
          "coords" -> axes.map { case (k, vs) => k -> Map(
            "dims" -> Seq(k),
            "attrs" -> Map.empty[String, Any],
            "data" -> vs)
          }.toMap,
          "data" -> nest(Nil, axes.map(_._2)))
    }
  }

  def dumpCampaignXarray(c: Campaign, path: String): Unit =
    dumpYaml(path, campaignToXarrayDict(c))

  /** Load + structurally validate an analysis config (reference:
    * apps/run.py validates against the jsonschema before building models;
    * Validation.scala is the graft analog). All violations are reported at
    * once; only a valid map reaches the model builder.
    */
  def loadAnalysis(path: String): MultiAnalysisConfig = {
    val m = loadMap(path)
    Validation.requireValid(m)
    fromMap(m)
  }

  def fromMap(m: Map[String, Any]): MultiAnalysisConfig = {
    def str(v: Any): String = Option(v).map(_.toString).getOrElse("")
    def num(v: Any): Double = v match {
      case n: Number => n.doubleValue()
      case s: String => s.toDouble
      case other => throw new IllegalArgumentException(s"not a number: $other")
    }
    val analyses = m.getOrElse("analysis", Map.empty[String, Any])
      .asInstanceOf[Map[String, Any]].toSeq.map { case (name, raw) =>
        val a = raw.asInstanceOf[Map[String, Any]]
        val ex = a.getOrElse("extraction", Map.empty[String, Any]).asInstanceOf[Map[String, Any]]
        val allWindows = ex.getOrElse("windows", Map.empty[String, Any])
          .asInstanceOf[Map[String, Any]]
        val windowRefs = allWindows.collect { case (wn, ref: String) => wn -> ref }
        val windows = allWindows.collect { case (wn, wraw: Map[_, _]) =>
            val w = wraw.asInstanceOf[Map[String, Any]]
            val bounds = w("bounds").asInstanceOf[Seq[Any]].map(num)
            val stepsList = w.get("trial_steps_list")
              .map(_.asInstanceOf[Seq[Any]].map(num)).getOrElse(Nil)
            // reference mutual-exclusion rule, checked on the RAW keys so an
            // explicit n_trials/trial_steps_value is rejected even at its
            // default value (analysis_model.py:92-96)
            if (stepsList.nonEmpty &&
              (w.contains("n_trials") || w.contains("trial_steps_value")))
              throw new IllegalArgumentException(
                s"window '$wn': trial_steps_list cannot be set with n_trials or trial_steps_value")
            wn -> WindowSpec(
              bounds = (bounds(0), bounds(1)),
              initialOffset = w.get("initial_offset").map(num).getOrElse(0.0),
              nTrials = w.get("n_trials").map(num(_).toInt).getOrElse(1),
              trialStepsValue = w.get("trial_steps_value").map(num).getOrElse(0.0),
              windowType = str(w.getOrElse("window_type", "")),
              tStep = w.get("t_step").map(num).getOrElse(0.0),
              trialStepsList = stepsList,
              trialStepsLabel = str(w.getOrElse("trial_steps_label", "")))
          }
        val trialSteps = ex.getOrElse("trial_steps", Map.empty[String, Any])
          .asInstanceOf[Map[String, Any]].map { case (tn, traw) =>
            val t = traw.asInstanceOf[Map[String, Any]]
            if (t.contains("initial_offset")) // analysis_model.py:108-127
              throw new IllegalArgumentException(
                s"trial_steps '$tn': forbidden extra fields: initial_offset")
            val b = t("bounds").asInstanceOf[Seq[Any]].map(num)
            val known = Set("function", "bounds", "population", "node_set",
              "node_sets_file", "node_sets_checksum", "limit", "base_path")
            tn -> TrialStepsSpec(
              function = str(t("function")),
              bounds = (b(0), b(1)),
              nodeSet = t.get("node_set").filter(_ != null).map(_.toString),
              limit = t.get("limit").filter(_ != null).map(num(_).toInt),
              params = t.view.filterKeys(!known.contains(_)).toMap)
          }
        for ((wn, w) <- windows if w.trialStepsLabel.nonEmpty)
          if (!trialSteps.contains(w.trialStepsLabel))
            throw new IllegalArgumentException(
              s"window '$wn' references unknown trial_steps '${w.trialStepsLabel}'")
        val classes = ex.getOrElse("neuron_classes", Map.empty[String, Any])
          .asInstanceOf[Map[String, Any]].map { case (cn, craw) =>
            val c = craw.asInstanceOf[Map[String, Any]]
            cn -> NeuronClassSpec(
              query = Q.parse(c.getOrElse("query", null)),
              nodeId = c.get("node_id").map(_.asInstanceOf[Seq[Any]].map(num(_).toLong)),
              limit = c.get("limit").filter(_ != null).map(num(_).toInt),
              nodeSet = c.get("node_set").filter(_ != null).map(_.toString))
          }
        val feats = a.getOrElse("features", Seq.empty[Any]).asInstanceOf[Seq[Any]].flatMap { fraw =>
          val f = fraw.asInstanceOf[Map[String, Any]]
          val base = FeaturesSpec(
            groupby = f.getOrElse("groupby", Seq.empty[Any]).asInstanceOf[Seq[Any]].map(_.toString),
            function = str(f("function")),
            params = f.getOrElse("params", Map.empty[String, Any]).asInstanceOf[Map[String, Any]],
            windows = f.getOrElse("windows", Seq.empty[Any]).asInstanceOf[Seq[Any]].map(_.toString),
            neuronClasses = f.getOrElse("neuron_classes", Seq.empty[Any])
              .asInstanceOf[Seq[Any]].map(_.toString))
          // params_product / params_zip expansion into suffixed combos
          // (reference: config/analysis.py:132-170)
          def lists(key: String): Map[String, Seq[Any]] =
            f.getOrElse(key, Map.empty[String, Any]).asInstanceOf[Map[String, Any]]
              .map { case (k, v) => k -> v.asInstanceOf[Seq[Any]] }
          FeatureExpansion.expand(base, lists("params_product"), lists("params_zip"))
        }
        SingleAnalysisConfig(
          name = name,
          reportType = str(ex.getOrElse("report", Map("type" -> "spikes"))
            .asInstanceOf[Map[String, Any]].getOrElse("type", "spikes")),
          windows = windows,
          neuronClasses = classes,
          features = feats,
          limit = ex.get("limit").filter(_ != null).map(num(_).toInt),
          seed = m.get("seed").map(num(_).toLong).getOrElse(0L),
          windowRefs = windowRefs,
          nodeSetsFile = ex.get("node_sets_file").filter(_ != null).map(_.toString),
          trialSteps = trialSteps,
          custom = a.getOrElse("custom", Map.empty[String, Any])
            .asInstanceOf[Map[String, Any]])
      }
    MultiAnalysisConfig(
      campaignPath = str(m.getOrElse("simulation_campaign", "")),
      output = str(m.getOrElse("output", "")),
      simulationsFilter = Q.parse(m.getOrElse("simulations_filter", null)),
      analyses = analyses,
      simulationsFilterInMemory = Q.parse(m.getOrElse("simulations_filter_in_memory", null)),
      cacheSettings = {
        val c = m.getOrElse("cache", Map.empty[String, Any]).asInstanceOf[Map[String, Any]]
        def bool(k: String) = c.get(k).exists {
          case b: Boolean => b
          case other => other.toString.toBoolean
        }
        CacheSettings(
          path = str(c.getOrElse("path", "")),
          clear = bool("clear") || (m.get("clear_cache") match {
            case Some(b: Boolean) => b
            case _ => false
          }),
          readonly = bool("readonly"),
          skipFeatures = bool("skip_features"),
          storeType = str(c.getOrElse("store_type", "parquet")),
          bucketGids = c.get("bucket_gids").filter(_ != null)
            .map(v => num(v).toInt).getOrElse(0))
      })
  }
}
