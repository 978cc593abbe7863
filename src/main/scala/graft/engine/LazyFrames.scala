package graft.engine

import org.apache.spark.sql.DataFrame

/** Immutable Map facade over memoized per-frame thunks: key enumeration,
  * `size`, `contains` and the duplicate-name check never construct a plan;
  * a frame's Catalyst plan (and any cache loadOrCompute side effect) runs
  * on first value access only, once. Used by `calculateFeatures` so a
  * caller evaluating one feature frame doesn't pay plan construction — or
  * cache writes — for its siblings. Iterating entries/values forces every
  * frame, preserving the strict semantics for full-dump callers.
  */
final class LazyFrames(entries: Seq[(String, () => DataFrame)])
    extends scala.collection.immutable.AbstractMap[String, DataFrame] {
  require(entries.map(_._1).distinct.size == entries.size,
    "duplicate frame names: " + entries.map(_._1).mkString(", "))
  private val order = entries.map(_._1)
  private val thunks = entries.toMap
  private val memo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  override def get(key: String): Option[DataFrame] =
    thunks.get(key).map(t => memo.computeIfAbsent(key, _ => t()))
  override def contains(key: String): Boolean = thunks.contains(key)
  override def size: Int = order.size
  override def keysIterator: Iterator[String] = order.iterator
  override def iterator: Iterator[(String, DataFrame)] =
    order.iterator.map(k => k -> apply(k))
  override def removed(key: String): Map[String, DataFrame] =
    if (!thunks.contains(key)) this
    else new LazyFrames(entries.filterNot(_._1 == key))
  // `updated`/`+` must stay lazy too: forcing siblings here would run
  // their plan construction and cache side effects for a caller that
  // only added/replaced one frame. A DataFrame value keeps the lazy
  // facade; any other V1 falls back to a strict Map (rare, typed-widening
  // callers that by construction want plain Map semantics).
  override def updated[V1 >: DataFrame](key: String, value: V1): Map[String, V1] =
    value match {
      case df: DataFrame =>
        val thunk = (key, () => df)
        new LazyFrames(if (thunks.contains(key))
          entries.map(e => if (e._1 == key) thunk else e)
        else entries :+ thunk).asInstanceOf[Map[String, V1]]
      case _ =>
        order.iterator.map(k => k -> (this(k): V1)).toMap.updated(key, value)
    }

  /** Lazy value transform — the counterpart of strict `.map` that keeps
    * untouched frames unconstructed (FilteredAnalyzer narrowing).
    */
  def mapFrames(f: (String, DataFrame) => DataFrame): LazyFrames =
    new LazyFrames(order.map(k => k -> (() => f(k, this(k)))))
}

object LazyFrames {
  def apply(entries: Seq[(String, () => DataFrame)]): LazyFrames =
    new LazyFrames(entries)
}
