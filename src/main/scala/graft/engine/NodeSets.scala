package graft.engine

import graft.dsl.{Q, QAnd, QCond, QIsIn, QSpec, QTrue}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SONATA-style node sets (reference: adapters/node_sets.py +
  * extract/neurons.py:53-56 — a JSON file of named selections, merged with
  * the circuit's own file, resolved to node populations):
  *
  * ```json
  * {
  *   "Layer1":   {"layer": [1]},              // property-based → P1 isin
  *   "Picked":   {"node_id": [1, 5, 9]},      // explicit ids
  *   "Combined": ["Layer1", "Picked"]         // compound = union of sets
  * }
  * ```
  * Property selections compile to the same predicate algebra as class
  * queries; compound sets union recursively.
  */
final case class NodeSets(sets: Map[String, Any]) {

  /** Merge (right wins on name clash — the `|=` of the reference). */
  def ++(other: NodeSets): NodeSets = NodeSets(sets ++ other.sets)

  /** Filter a node table down to the named set's members. */
  def select(name: String, nodes: DataFrame): DataFrame = {
    val resolving = scala.collection.mutable.Set.empty[String]
    def go(n: String, df: DataFrame): DataFrame = {
      require(resolving.add(n), s"node set cycle through '$n'")
      val out = sets.getOrElse(n,
        throw new IllegalArgumentException(s"unknown node set '$n'")) match {
        case compound: Seq[_] =>
          compound.map(m => go(m.toString, df)).reduce(_ unionByName _).distinct()
        case m: Map[_, _] =>
          val spec = m.asInstanceOf[Map[String, Any]]
          val ids = spec.get("node_id")
          val props = spec - "node_id"
          var cur = df
          ids.foreach { v =>
            val idSeq = v.asInstanceOf[Seq[Any]].map {
              case n: Number => n.longValue()
              case other => other.toString.toLong
            }
            cur = cur.filter(col("gid").isin(idSeq: _*))
          }
          if (props.nonEmpty) Q.q(cur, NodeSets.propsToSpec(props)) else cur
        case other =>
          throw new IllegalArgumentException(s"bad node set body for '$n': $other")
      }
      resolving.remove(n)
      out
    }
    go(name, nodes)
  }
}

object NodeSets {
  val empty: NodeSets = NodeSets(Map.empty)

  def fromFile(path: String): NodeSets =
    NodeSets(ConfigIO.loadMap(path))

  /** SONATA property selection: scalar = eq, list = isin. */
  private[engine] def propsToSpec(props: Map[String, Any]): QSpec =
    if (props.isEmpty) QTrue
    else QAnd(props.map {
      case (k, vs: Seq[_]) => k -> QCond(QIsIn(vs))
      case (k, v) => k -> QCond(graft.dsl.QEq(v))
    })
}
