package graft.engine

import scala.collection.immutable.ListMap

/** Config migration (reference: src/blueetl/apps/migrate.py): rewrite
  * v1 (BlueETL 0.1.x) / v2 (0.2.x) / v3 (0.8.x) analysis configs to the
  * current v4 format — same key renames, same collision checks (a rename
  * target that already exists is an error, migrate.py:16-26).
  */
object Migrate {

  /** Highest (= current) config version (reference constants.py
    * CONFIG_VERSION; migrate.py:13 supports exactly this version).
    */
  val ConfigVersion = 4

  private def asMap(v: Any): Map[String, Any] = v match {
    case null => Map.empty
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case other =>
      throw new IllegalArgumentException(s"expected object, got $other")
  }

  private def safeSet(d: Map[String, Any], key: String, value: Any): Map[String, Any] = {
    if (d.contains(key))
      throw new IllegalArgumentException(
        s"The key $key is already present in ${d.keys.toSeq.sorted.mkString("{", ", ", "}")}")
    d + (key -> value)
  }

  private def renameKey(d: Map[String, Any], old: String, nw: String): Map[String, Any] =
    d.get(old).map(v => safeSet(d - old, nw, v)).getOrElse(d)

  /** v1 → v2 (migrate.py:29-60): nest extraction/features under
    * `analysis.spikes`, rename per-class `gid` to `$gids`; whatever is left
    * of the root becomes the analysis `custom` dict.
    */
  private def v1ToV2(in: Map[String, Any]): Map[String, Any] = {
    val rootKeys = Seq("simulation_campaign", "output",
      "simulations_filter", "simulations_filter_in_memory")
    val kept = rootKeys.flatMap(k => in.get(k).map(k -> _))
    val extraction = asMap(in.getOrElse("extraction",
      throw new IllegalArgumentException("v1 config has no 'extraction'")))
    val nc = asMap(extraction.getOrElse("neuron_classes", Map.empty))
      .map { case (k, v) => k -> renameKey(asMap(v), "gid", "$gids") }
    val features = in.get("analysis").map(asMap)
      .flatMap(_.get("features")).getOrElse(Seq.empty[Any])
    val custom = in -- rootKeys -- Seq("extraction", "analysis", "version")
    Map("version" -> 2) ++ kept ++ Map(
      "analysis" -> Map("spikes" -> (Map(
        "extraction" ->
          (Map("report" -> Map("type" -> "spikes")) ++ extraction +
            ("neuron_classes" -> nc)),
        "features" -> features) ++
        (if (custom.nonEmpty) Map("custom" -> custom) else Map.empty))))
  }

  /** v2 → v3 (migrate.py:63-81): `target` → `node_set` at extraction level;
    * per class, plain keys fold into a `query` dict and the `$`-prefixed
    * knobs lose their sigil ($target/$limit/$gids/$query →
    * node_set/limit/node_id/query).
    */
  private def v2ToV3(in: Map[String, Any]): Map[String, Any] = {
    val analyses = asMap(in("analysis")).map { case (name, a0) =>
      val a = asMap(a0)
      val ex0 = renameKey(asMap(a("extraction")), "target", "node_set")
      val nc = asMap(ex0.getOrElse("neuron_classes", Map.empty)).map { case (k, v0) =>
        var v = asMap(v0)
        val query = v.view.filterKeys(!_.startsWith("$")).toMap
        if (query.nonEmpty)
          v = safeSet(v.view.filterKeys(_.startsWith("$")).toMap, "query", query)
        v = renameKey(v, "$target", "node_set")
        v = renameKey(v, "$limit", "limit")
        v = renameKey(v, "$gids", "node_id")
        v = renameKey(v, "$query", "query")
        k -> v
      }
      name -> (a + ("extraction" -> (ex0 + ("neuron_classes" -> nc))))
    }
    in + ("version" -> 3) + ("analysis" -> analyses)
  }

  /** v3 → v4 (migrate.py:84-93, the analysis_model.py:236-251 deprecated
    * fields): root `output` → `cache.path`, root `clear_cache` →
    * `cache.clear`.
    */
  private def v3ToV4(in: Map[String, Any]): Map[String, Any] = {
    var out = in + ("version" -> 4)
    var cacheCfg = asMap(out.getOrElse("cache", Map.empty))
    // the key is always popped, but an explicit `output: null` / `clear_cache:
    // null` must NOT write a null into cache (migrate.py:89-92 pops with a
    // None default and only sets when not None)
    out.get("output").foreach { v =>
      if (v != null) cacheCfg = safeSet(cacheCfg, "path", v)
      out -= "output"
    }
    out.get("clear_cache").foreach { v =>
      if (v != null) cacheCfg = safeSet(cacheCfg, "clear", v)
      out -= "clear_cache"
    }
    out + ("cache" -> cacheCfg)
  }

  /** Canonical root-key order (migrate.py:96-107). */
  def sortRootKeys(in: Map[String, Any]): Map[String, Any] = {
    val order = Seq("version", "simulation_campaign", "simulations_filter",
      "simulations_filter_in_memory", "cache", "analysis", "custom")
    val head = order.flatMap(k => in.get(k).map(k -> _))
    val tail = in.toSeq.filterNot { case (k, _) => order.contains(k) }
    ListMap((head ++ tail): _*)
  }

  /** Apply every applicable step (migrate.py:114-131). A config already at
    * the current version passes through unchanged (the CLI warns).
    */
  def migrate(config: Map[String, Any]): Map[String, Any] = {
    val version = config.get("version") match {
      case Some(n: Number) => n.intValue()
      case Some(other) =>
        throw new IllegalArgumentException(s"The config version $other isn't supported.")
      case None => 1
    }
    if (version < 1 || version > ConfigVersion)
      throw new IllegalArgumentException(s"The config version $version isn't supported.")
    var c = config
    if (version <= 1) c = v1ToV2(c)
    if (version <= 2) c = v2ToV3(c)
    if (version <= 3) c = v3ToV4(c)
    c
  }
}
