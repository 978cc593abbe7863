package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The `etl.q` dict-filter DSL (reference: blueetl-core, documented in
  * doc/source/notebooks/01_core_transformations.ipynb, used throughout e.g.
  * src/blueetl/extract/base.py:90, src/blueetl/extract/neurons.py:78),
  * compiled to a Catalyst `Column` predicate so filters participate in
  * predicate pushdown / partition pruning instead of materializing masks.
  *
  * Spec shape (mirrors the reference semantics):
  *   - `QAnd(Map(col -> cond))` — AND across keys;
  *   - cond: scalar (equality), sequence (isin), or op-map with
  *     `eq, ne, le, lt, ge, gt, isin, regex` (regex is re.search — unanchored
  *     — which is exactly `rlike`);
  *   - `QOr(Seq(spec*))` — union (OR) of the row sets;
  *   - empty spec — no filtering.
  *
  * The reference's "index level or column" unification is free here: Spark
  * has no index, every key level is a column (SURVEY §2.2 P1).
  */
sealed trait QSpec {
  def &&(other: QSpec): QSpec = (this, other) match {
    case (QTrue, o) => o
    case (t, QTrue) => t
    case (QAnd(a), QAnd(b)) if a.keySet.intersect(b.keySet).isEmpty => QAnd(a ++ b)
    case (a, b) => QAllOf(Seq(a, b))
  }
}
case object QTrue extends QSpec
final case class QAnd(conds: Map[String, QCond]) extends QSpec
final case class QOr(specs: Seq[QSpec]) extends QSpec
final case class QAllOf(specs: Seq[QSpec]) extends QSpec

object QAnd {
  /** Convenience: QAnd("a" -> QEq(1), "b" -> QIsIn(Seq("x","y"))) */
  def apply(pairs: (String, QCond)*): QAnd = QAnd(pairs.toMap)
}

/** A condition on a single column: one or more primitive ops, ANDed. */
final case class QCond(ops: Seq[QOp]) {
  def &&(other: QCond): QCond = QCond(ops ++ other.ops)
}
object QCond {
  def apply(op: QOp): QCond = QCond(Seq(op))
}

sealed trait QOp
final case class QEq(v: Any) extends QOp
final case class QNe(v: Any) extends QOp
final case class QLe(v: Any) extends QOp
final case class QLt(v: Any) extends QOp
final case class QGe(v: Any) extends QOp
final case class QGt(v: Any) extends QOp
final case class QIsIn(vs: Seq[Any]) extends QOp
final case class QRegex(pattern: String) extends QOp

object Q {

  /** Parse the reference's dict form into a spec: a map is AND-of-keys
    * (value = scalar eq, seq = isin, op-map = ops), a list of maps is OR
    * (union of row sets), null/empty = no filter. Mirrors `etl.q` argument
    * handling (reference: blueetl-core, notebook 01_core_transformations).
    */
  def parse(v: Any): QSpec = v match {
    case null => QTrue
    case m: Map[_, _] if m.isEmpty => QTrue
    case m: Map[_, _] =>
      QAnd(m.map { case (k, cond) => k.toString -> parseCond(cond) }.toMap)
    case s: Seq[_] => QOr(s.map(parse))
    case other => throw new IllegalArgumentException(s"bad filter spec: $other")
  }

  private val opNames = Set("eq", "ne", "le", "lt", "ge", "gt", "isin", "regex")

  private def parseCond(v: Any): QCond = v match {
    case m: Map[_, _] if m.keys.forall(k => opNames(k.toString)) =>
      QCond(m.toSeq.map {
        case (k, x) => k.toString match {
          case "eq" => QEq(x)
          case "ne" => QNe(x)
          case "le" => QLe(x)
          case "lt" => QLt(x)
          case "ge" => QGe(x)
          case "gt" => QGt(x)
          case "isin" => QIsIn(asSeq(x))
          case "regex" => QRegex(x.toString)
        }
      })
    case s: Seq[_] => QCond(QIsIn(s))
    case scalar => QCond(QEq(scalar))
  }

  private def asSeq(x: Any): Seq[Any] = x match {
    case s: Seq[_] => s
    case other => Seq(other)
  }

  /** Compile a spec to a Catalyst predicate. */
  def compile(spec: QSpec): Column = spec match {
    case QTrue => lit(true)
    case QAnd(conds) =>
      if (conds.isEmpty) lit(true)
      else conds.toSeq.sortBy(_._1).map { case (k, c) => compileCond(col(k), c) }
        .reduce(_ && _)
    case QOr(specs) =>
      if (specs.isEmpty) lit(true)
      else specs.map(compile).reduce(_ || _)
    case QAllOf(specs) =>
      if (specs.isEmpty) lit(true)
      else specs.map(compile).reduce(_ && _)
  }

  def compileCond(c: Column, cond: QCond): Column =
    cond.ops.map(compileOp(c, _)).reduce(_ && _)

  private def compileOp(c: Column, op: QOp): Column = op match {
    case QEq(v)      => c === lit(v)
    case QNe(v)      => c =!= lit(v)
    case QLe(v)      => c <= lit(v)
    case QLt(v)      => c < lit(v)
    case QGe(v)      => c >= lit(v)
    case QGt(v)      => c > lit(v)
    case QIsIn(vs)   => if (vs.isEmpty) lit(false) else c.isin(vs: _*)
    case QRegex(p)   => c.rlike(p) // re.search semantics: unanchored, like rlike
  }

  /** `df.filter(Q(...))` convenience mirroring `df.etl.q(...)`. */
  def q(df: DataFrame, spec: QSpec): DataFrame = df.filter(compile(spec))

  // --------------------------------------------------------------------
  // Subfilter algebra (reference: cache subsystem `_is_subfilter`,
  // src/blueetl/cache.py:575-610): `isSubfilter(a, b)` == "filter a selects
  // a subset of the rows filter b selects, for every possible dataset".
  // Conservative: false negatives allowed, false positives are a bug
  // (they would let the cache serve wrong data). Property-tested against a
  // brute-force row-set oracle in QSpec tests.
  // --------------------------------------------------------------------

  def isSubfilter(a: QSpec, b: QSpec): Boolean = (normalize(a), normalize(b)) match {
    case (_, QTrue) => true
    case (QTrue, _) => false // b filters something, a doesn't
    case (QOr(as), nb) => as.forall(x => isSubfilter(x, nb))
    case (na, QOr(bs)) => bs.exists(x => isSubfilter(na, x))
    case (QAnd(ac), QAnd(bc)) =>
      // every constraint in b must be implied by a's constraint on that key
      bc.forall { case (k, bcond) =>
        ac.get(k).exists(acond => condImplies(acond, bcond))
      }
    case _ => false
  }

  /** Flatten QAllOf into QAnd where possible; normalize nested specs. */
  def normalize(spec: QSpec): QSpec = spec match {
    case QAllOf(specs) =>
      val normed = specs.map(normalize)
      if (normed.contains(QTrue)) normalize(QAllOf(normed.filterNot(_ == QTrue)))
      else if (normed.isEmpty) QTrue
      else if (normed.size == 1) normed.head
      else if (normed.forall(_.isInstanceOf[QAnd])) {
        val maps = normed.collect { case QAnd(m) => m }
        val keys = maps.flatMap(_.keys)
        QAnd(keys.map { k =>
          k -> maps.flatMap(_.get(k)).reduce(_ && _)
        }.toMap)
      } else QAllOf(normed)
    case QOr(specs) =>
      val normed = specs.map(normalize)
      if (normed.isEmpty) QTrue else if (normed.size == 1) normed.head else QOr(normed)
    case QAnd(m) if m.isEmpty => QTrue
    case other => other
  }

  /** Does condition a (on one column) imply condition b? */
  private def condImplies(a: QCond, b: QCond): Boolean =
    b.ops.forall(bop => opImplied(a.ops, bop))

  private def opImplied(aops: Seq[QOp], bop: QOp): Boolean = bop match {
    case QEq(v) => aops.exists {
      case QEq(w)     => veq(w, v)
      case QIsIn(ws)  => ws.nonEmpty && ws.forall(veq(_, v))
      case _ => false
    }
    case QIsIn(vs) =>
      val set = vs
      aops.exists {
        case QEq(w)    => set.exists(veq(w, _))
        case QIsIn(ws) => ws.forall(w => set.exists(veq(w, _)))
        case _ => false
      }
    case QNe(v) => aops.exists {
      case QNe(w)    => veq(w, v)
      // != implication needs comparable-and-unequal, not merely not-equal:
      // for incomparable types (Int 5 vs String "5") Spark's coercing
      // comparison may match rows veq(w,v)=false would wrongly exclude.
      case QEq(w)    => cmp(w, v).exists(_ != 0)
      case QIsIn(ws) => ws.forall(w => cmp(w, v).exists(_ != 0))
      case QLt(w)    => cmp(w, v).exists(_ <= 0)   // x < w <= v  => x != v
      case QGt(w)    => cmp(w, v).exists(_ >= 0)
      case QLe(w)    => cmp(w, v).exists(_ < 0)
      case QGe(w)    => cmp(w, v).exists(_ > 0)
      case _ => false
    }
    case QLe(v) => aops.exists {
      case QLe(w)    => cmp(w, v).exists(_ <= 0)
      case QLt(w)    => cmp(w, v).exists(_ <= 0)
      case QEq(w)    => cmp(w, v).exists(_ <= 0)
      case QIsIn(ws) => ws.nonEmpty && ws.forall(w => cmp(w, v).exists(_ <= 0))
      case _ => false
    }
    case QLt(v) => aops.exists {
      case QLt(w)    => cmp(w, v).exists(_ <= 0)
      case QLe(w)    => cmp(w, v).exists(_ < 0)
      case QEq(w)    => cmp(w, v).exists(_ < 0)
      case QIsIn(ws) => ws.nonEmpty && ws.forall(w => cmp(w, v).exists(_ < 0))
      case _ => false
    }
    case QGe(v) => aops.exists {
      case QGe(w)    => cmp(w, v).exists(_ >= 0)
      case QGt(w)    => cmp(w, v).exists(_ >= 0)
      case QEq(w)    => cmp(w, v).exists(_ >= 0)
      case QIsIn(ws) => ws.nonEmpty && ws.forall(w => cmp(w, v).exists(_ >= 0))
      case _ => false
    }
    case QGt(v) => aops.exists {
      case QGt(w)    => cmp(w, v).exists(_ >= 0)
      case QGe(w)    => cmp(w, v).exists(_ > 0)
      case QEq(w)    => cmp(w, v).exists(_ > 0)
      case QIsIn(ws) => ws.nonEmpty && ws.forall(w => cmp(w, v).exists(_ > 0))
      case _ => false
    }
    case QRegex(p) => aops.exists {
      case QRegex(q) => q == p
      case _ => false
    }
  }

  private def veq(a: Any, b: Any): Boolean =
    a == b || cmp(a, b).contains(0)

  /** Total comparison when both values are numeric or both strings. */
  private def cmp(a: Any, b: Any): Option[Int] = (asNum(a), asNum(b)) match {
    case (Some(x), Some(y)) => Some(java.lang.Double.compare(x, y))
    case _ => (a, b) match {
      case (x: String, y: String) => Some(x.compareTo(y))
      case _ => None
    }
  }

  private def asNum(v: Any): Option[Double] = v match {
    case n: Int => Some(n.toDouble)
    case n: Long => Some(n.toDouble)
    case n: Double => Some(n)
    case n: Float => Some(n.toDouble)
    case n: Short => Some(n.toDouble)
    case n: Byte => Some(n.toDouble)
    case n: BigDecimal => Some(n.toDouble)
    case _ => None
  }
}
