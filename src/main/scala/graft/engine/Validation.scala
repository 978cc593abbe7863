package graft.engine

/** Structural config validation (reference: validation.py:24-47 validating
  * against schemas/analysis_config.yaml with jsonschema): unknown keys,
  * wrong types, and missing required fields are reported ALL AT ONCE with
  * jsonschema-style `root.path.to.field: message` strings, before any model
  * construction — so malformed configs fail fast and completely instead of
  * dying late on the first cast error.
  *
  * The schema here is the graft surface (the reference schema minus
  * deliberately-unsupported knobs like feather store_type), expressed as a
  * tiny combinator set rather than a jsonschema engine — no new
  * dependencies, same class of guarantees.
  */
object Validation {

  final case class Violation(path: String, message: String) {
    override def toString: String = s"$path: $message"
  }

  // ---- combinators ------------------------------------------------------

  private type Check = (String, Any) => Seq[Violation]

  private def typeName(v: Any): String = v match {
    case null => "null"
    case _: String => "string"
    case _: Boolean => "boolean"
    case _: Int | _: Long | _: java.math.BigInteger => "integer"
    case _: Number => "number"
    case _: Map[_, _] => "object"
    case _: Seq[_] => "array"
    case other => other.getClass.getSimpleName
  }

  private val isString: Check = (p, v) =>
    if (v.isInstanceOf[String]) Nil else Seq(Violation(p, s"expected string, got ${typeName(v)}"))

  private val isNumber: Check = (p, v) => v match {
    case _: Number => Nil
    case _ => Seq(Violation(p, s"expected number, got ${typeName(v)}"))
  }

  private val isInt: Check = (p, v) => v match {
    case _: Int | _: Long | _: java.math.BigInteger => Nil
    case _ => Seq(Violation(p, s"expected integer, got ${typeName(v)}"))
  }

  private val isObject: Check = (p, v) => v match {
    case _: Map[_, _] => Nil
    case _ => Seq(Violation(p, s"expected object, got ${typeName(v)}"))
  }

  private def arrayOf(elem: Check): Check = (p, v) => v match {
    case s: Seq[_] => s.zipWithIndex.flatMap { case (x, i) => elem(s"$p[$i]", x) }
    case _ => Seq(Violation(p, s"expected array, got ${typeName(v)}"))
  }

  private def enumOf(allowed: Set[String]): Check = (p, v) => v match {
    case s: String if allowed(s) => Nil
    case s: String => Seq(Violation(p, s"'$s' is not one of ${allowed.toSeq.sorted.mkString(", ")}"))
    case other => Seq(Violation(p, s"expected string, got ${typeName(other)}"))
  }

  /** An object with a fixed property set: per-key checks, required keys,
    * unknown keys rejected unless `open` (then checked keys still apply).
    */
  private def obj(
      props: Map[String, Check],
      required: Seq[String] = Nil,
      open: Boolean = false,
      forbidden: Set[String] = Set.empty): Check = (p, v) => v match {
    case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      val unknown =
        if (open) Nil
        else mm.keys.filterNot(props.contains).toSeq.sorted
          .map(k => Violation(s"$p.$k", "unknown key"))
      val missing = required.filterNot(mm.contains)
        .map(k => Violation(p, s"missing required key '$k'"))
      val bad = forbidden.intersect(mm.keySet).toSeq.sorted
        .map(k => Violation(s"$p.$k", "forbidden key"))
      val inner = mm.toSeq.sortBy(_._1).flatMap { case (k, x) =>
        // optional keys are nullable (reference schema: every Optional
        // field admits type [..., "null"]); required keys are not
        if (x == null && !required.contains(k)) Nil
        else props.get(k).map(_(s"$p.$k", x)).getOrElse(Nil)
      }
      unknown ++ missing ++ bad ++ inner
    case _ => Seq(Violation(p, s"expected object, got ${typeName(v)}"))
  }

  /** A map with arbitrary keys, each value checked. */
  private def mapOf(value: Check): Check = (p, v) => v match {
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
        .flatMap { case (k, x) => value(s"$p.$k", x) }
    case _ => Seq(Violation(p, s"expected object, got ${typeName(v)}"))
  }

  // ---- the analysis-config schema --------------------------------------

  private val boundsCheck: Check = (p, v) => v match {
    case s: Seq[_] if s.length == 2 => arrayOf(isNumber)(p, v)
    case s: Seq[_] => Seq(Violation(p, s"bounds must have exactly 2 elements, got ${s.length}"))
    case _ => Seq(Violation(p, s"expected array, got ${typeName(v)}"))
  }

  private val windowObjCheck: Check = obj(
    props = Map(
      "bounds" -> boundsCheck,
      "initial_offset" -> isNumber,
      "n_trials" -> isInt,
      "trial_steps_value" -> isNumber,
      "trial_steps_list" -> arrayOf(isNumber),
      "trial_steps_label" -> isString,
      "window_type" -> isString,
      "t_step" -> isNumber),
    required = Seq("bounds"))

  // a window is either an object or a cross-analysis reference string —
  // discriminated on the value's shape so object errors keep their paths
  private val windowCheck: Check = (p, v) => v match {
    case _: String => Nil
    case _: Map[_, _] => windowObjCheck(p, v)
    case _ => Seq(Violation(p, s"expected object or reference string, got ${typeName(v)}"))
  }

  private val queryCheck: Check = (p, v) => v match {
    case _: Map[_, _] => Nil // Q.parse validates the predicate grammar
    case s: Seq[_] => s.zipWithIndex.flatMap { case (x, i) => isObject(s"$p[$i]", x) }
    case _ => Seq(Violation(p, s"expected object or array of objects, got ${typeName(v)}"))
  }

  private val neuronClassCheck: Check = obj(
    props = Map(
      "query" -> queryCheck,
      "population" -> isString,
      "node_set" -> isString,
      "node_sets_file" -> isString,
      "node_sets_checksum" -> isString,
      "limit" -> isInt,
      "node_id" -> arrayOf(isInt)))

  private val trialStepsCheck: Check = obj(
    props = Map(
      "function" -> isString,
      "bounds" -> boundsCheck,
      "population" -> isString,
      "node_set" -> isString,
      "node_sets_file" -> isString,
      "node_sets_checksum" -> isString,
      "limit" -> isInt,
      "base_path" -> isString),
    required = Seq("function", "bounds"),
    open = true, // extra keys become function params
    forbidden = Set("initial_offset")) // analysis_model.py:108-127

  private val featuresCheck: Check = obj(
    props = Map(
      "id" -> isInt,
      "type" -> isString,
      "name" -> isString,
      "groupby" -> arrayOf(isString),
      "function" -> isString,
      "params" -> isObject,
      "params_product" -> isObject,
      "params_zip" -> isObject,
      "windows" -> arrayOf(isString),
      "neuron_classes" -> arrayOf(isString),
      "suffix" -> isString),
    required = Seq("groupby", "function"))

  private val extractionCheck: Check = obj(
    props = Map(
      "report" -> obj(
        props = Map(
          "type" -> enumOf(Set("spikes", "soma", "compartment")),
          "name" -> isString),
        required = Seq("type")),
      "neuron_classes" -> mapOf(neuronClassCheck),
      "windows" -> mapOf(windowCheck),
      "trial_steps" -> mapOf(trialStepsCheck),
      "population" -> isString,
      "node_set" -> isString,
      "node_sets_file" -> isString,
      "limit" -> isInt),
    required = Seq("report", "neuron_classes", "windows"))

  private val analysisCheck: Check = obj(
    props = Map(
      "extraction" -> extractionCheck,
      "features" -> arrayOf(featuresCheck),
      "custom" -> isObject),
    required = Seq("extraction"))

  private val rootCheck: Check = obj(
    props = Map(
      "version" -> isInt,
      "simulation_campaign" -> isString,
      "output" -> isString,
      "cache" -> obj(
        props = Map(
          "path" -> isString,
          "clear" -> ((p, v) => v match {
            case _: Boolean => Nil
            case _ => Seq(Violation(p, s"expected boolean, got ${typeName(v)}"))
          }),
          "readonly" -> ((p, v) => v match {
            case _: Boolean => Nil
            case _ => Seq(Violation(p, s"expected boolean, got ${typeName(v)}"))
          }),
          "skip_features" -> ((p, v) => v match {
            case _: Boolean => Nil
            case _ => Seq(Violation(p, s"expected boolean, got ${typeName(v)}"))
          }),
          "store_type" -> enumOf(Set("parquet", "feather")),
          // engine extension: hash-cluster the cached report by gid
          "bucket_gids" -> isInt)),
      "clear_cache" -> ((p, v) => v match {
        case _: Boolean => Nil
        case _ => Seq(Violation(p, s"expected boolean, got ${typeName(v)}"))
      }),
      "seed" -> isInt,
      "simulations_filter" -> isObject,
      "simulations_filter_in_memory" -> isObject,
      "analysis" -> mapOf(analysisCheck),
      "custom" -> isObject),
    required = Seq("simulation_campaign", "analysis"))

  /** All structural violations of an analysis-config map (empty = valid).
    * Mirrors jsonschema's iter_errors: every problem reported, paths
    * rooted at `root`.
    */
  def validateAnalysis(config: Map[String, Any]): Seq[Violation] =
    if (config == null || config.isEmpty) Seq(Violation("root", "empty configuration"))
    else rootCheck("root", config)

  /** Throwing form (reference raises ValidationError). */
  def requireValid(config: Map[String, Any]): Unit = {
    val vs = validateAnalysis(config)
    if (vs.nonEmpty)
      throw new IllegalArgumentException(
        s"invalid configuration:\n${vs.zipWithIndex.map { case (v, i) => s"${i + 1}: $v" }.mkString("\n")}")
  }
}
