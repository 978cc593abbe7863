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
  * trial k starts at initial_offset + k*trial_steps_value).
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
    tStep: Double = 0.0) {
  require(nTrials >= 1, "n_trials >= 1")
  def duration: Double = bounds._2 - bounds._1
}

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
    nodeSetsFile: Option[String] = None)

final case class MultiAnalysisConfig(
    campaignPath: String,
    output: String,
    simulationsFilter: QSpec,
    analyses: Seq[SingleAnalysisConfig])

/** A simulation campaign: the flat table of conditions + simulation paths
  * (reference: src/blueetl/campaign/config.py:164-239 — both the native
  * "blueetl" dict format and the xarray-converted form reduce to this).
  */
final case class Campaign(
    name: String,
    pathPrefix: String,
    attrs: Map[String, Any],
    rows: Seq[Map[String, Any]]) {
  def resolvedPaths: Seq[String] = rows.map { r =>
    val p = r.getOrElse("simulation_path", "").toString
    if (p.startsWith("/") || pathPrefix.isEmpty) p else s"$pathPrefix/$p"
  }
}

object ConfigIO {
  private val yaml = new ObjectMapper(new YAMLFactory()).registerModule(DefaultScalaModule)

  def loadMap(path: String): Map[String, Any] = {
    val txt = Files.readString(Paths.get(path))
    yaml.readValue(txt, classOf[Map[String, Any]])
  }

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

  def loadCampaign(path: String): Campaign = {
    val m = loadMap(path)
    val attrs = m.getOrElse("attrs", Map.empty[String, Any]).asInstanceOf[Map[String, Any]]
    Campaign(
      name = m.getOrElse("name", "").toString,
      pathPrefix = attrs.getOrElse("path_prefix", m.getOrElse("path_prefix", "")).toString,
      attrs = attrs,
      rows = m.getOrElse("data", Seq.empty[Any]).asInstanceOf[Seq[Any]]
        .map(_.asInstanceOf[Map[String, Any]]))
  }

  def loadAnalysis(path: String): MultiAnalysisConfig = fromMap(loadMap(path))

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
            wn -> WindowSpec(
              bounds = (bounds(0), bounds(1)),
              initialOffset = w.get("initial_offset").map(num).getOrElse(0.0),
              nTrials = w.get("n_trials").map(num(_).toInt).getOrElse(1),
              trialStepsValue = w.get("trial_steps_value").map(num).getOrElse(0.0),
              windowType = str(w.getOrElse("window_type", "")),
              tStep = w.get("t_step").map(num).getOrElse(0.0))
          }
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
          nodeSetsFile = ex.get("node_sets_file").filter(_ != null).map(_.toString))
      }
    MultiAnalysisConfig(
      campaignPath = str(m.getOrElse("simulation_campaign", "")),
      output = str(m.getOrElse("output", "")),
      simulationsFilter = Q.parse(m.getOrElse("simulations_filter", null)),
      analyses = analyses)
  }
}
