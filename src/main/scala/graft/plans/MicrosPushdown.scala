package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Unwraps monotone micros arithmetic in comparisons so time-window
  * predicates reach the parquet scan as plain `ts <op> literal` filters.
  *
  * The engine exposes event/spike time as `unix_micros(ts) - origin`
  * (long µs since the stream origin; `Tables.spikes`, `EventsAdapter`).
  * Without this rule a window predicate like `time >= 3.6e9` compiles to
  * `unix_micros(cast(ts)) - 1704067200000000 >= 3600000000` — a filter the
  * file source cannot translate, so `PushedFilters` carries only
  * `IsNotNull(ts)` and every row group is read. At cluster scale that is
  * the difference between scanning a day and scanning the whole dataset:
  * parquet row-group min/max stats on `ts` can only prune against a BARE
  * column comparison.
  *
  * Each unwrapped layer is an exact order-embedding on the relevant
  * domain, so the rewrite preserves results bit-for-bit (all layers
  * null-propagate 1:1 with their child):
  *
  *  - `unix_micros(t) <op> v`          ⇔ `t <op> timestamp_micros(v)` (bijection)
  *  - `timestamp_micros(x) <op> t`     ⇔ `x <op> unix_micros(t)` (bijection)
  *  - `(x - k) <op> v` / `(x + k)`     ⇔ `x <op> v ± k` (checked arithmetic;
  *    bails on literal overflow — the data-side cannot overflow for real
  *    timestamps, |unix_micros| < 2^63 / 2900)
  *  - `cast(ntz as timestamp) <op> v`  ⇔ `ntz <op> v + zone_offset` for
  *    FIXED-OFFSET session zones (UTC in every graft session); DST zones bail
  *  - `cast(x: long as double) <op> v` ⇔ integer-bound comparison
  *    (long→double is exact below 2^53; bails above, and on non-integral
  *    equality)
  *  - `(x div d) <op> v` for literal `d > 0, v > 0` ⇔ scaled bound on `x`
  *    (exact under both truncating and flooring division for these signs;
  *    other signs bail — ns→µs chains always compare against positive µs)
  *
  * Applied only when the comparison tree is anchored in a timestamp
  * conversion (`unix_micros`/`timestamp_micros`), so generic user
  * arithmetic is never touched. Registered per-session via
  * `GraftFunctions.register` (`spark.experimental.extraOptimizations` —
  * the last optimizer batch, after predicates have been pushed next to
  * their scans) and for cluster deployments via `GraftExtensions`.
  */
object MicrosPushdown extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case cmp: BinaryComparison if anchored(cmp) => rewrite(cmp)
    }

  private def anchored(e: Expression): Boolean = e.exists {
    case _: UnixMicros | _: MicrosToTimestamp => true
    case _ => false
  }

  /** The comparison being rebuilt, as a direction-aware builder. */
  private sealed trait Op {
    def build(l: Expression, r: Expression): Expression
    /** op for `x` when the layer flips nothing (all layers here are
      * monotone increasing, so the op never flips; kept for clarity). */
    def isEquality: Boolean = false
  }
  private case object Ge extends Op { def build(l: Expression, r: Expression) = GreaterThanOrEqual(l, r) }
  private case object Gt extends Op { def build(l: Expression, r: Expression) = GreaterThan(l, r) }
  private case object Le extends Op { def build(l: Expression, r: Expression) = LessThanOrEqual(l, r) }
  private case object Lt extends Op { def build(l: Expression, r: Expression) = LessThan(l, r) }
  private case object Eq extends Op {
    def build(l: Expression, r: Expression) = EqualTo(l, r)
    override def isEquality = true
  }

  private def rewrite(cmp: BinaryComparison): Expression = {
    val normalized: Option[(Expression, Op, Literal)] = (cmp, cmp.left, cmp.right) match {
      case (_: GreaterThanOrEqual, e, l: Literal) => Some((e, Ge, l))
      case (_: GreaterThan, e, l: Literal)        => Some((e, Gt, l))
      case (_: LessThanOrEqual, e, l: Literal)    => Some((e, Le, l))
      case (_: LessThan, e, l: Literal)           => Some((e, Lt, l))
      case (_: EqualTo, e, l: Literal)            => Some((e, Eq, l))
      // literal on the left: mirror the op
      case (_: GreaterThanOrEqual, l: Literal, e) => Some((e, Le, l))
      case (_: GreaterThan, l: Literal, e)        => Some((e, Lt, l))
      case (_: LessThanOrEqual, l: Literal, e)    => Some((e, Ge, l))
      case (_: LessThan, l: Literal, e)           => Some((e, Gt, l))
      case (_: EqualTo, l: Literal, e)            => Some((e, Eq, l))
      case _ => None
    }
    normalized
      .filter { case (e, _, l) => e.deterministic && l.value != null }
      .flatMap { case (e, op, l) => unwrap(e, op, l) }
      .getOrElse(cmp)
  }

  /** One unwrapped layer or None; recurses until no layer matches, then
    * rebuilds the comparison IF at least one layer was removed (callers
    * get None for a no-op, leaving the original expression untouched).
    */
  private def unwrap(e: Expression, op: Op, lit: Literal): Option[Expression] = {
    def done(child: Expression, l: Literal): Some[Expression] =
      Some(unwrap(child, op, l).getOrElse(op.build(child, l)))

    e match {
      // unix_micros(t) <op> v:long  →  t <op> (v µs as timestamp)
      case u: UnixMicros if lit.dataType == LongType =>
        done(u.child, Literal(lit.value, u.child.dataType match {
          case TimestampNTZType => TimestampNTZType
          case _ => TimestampType
        }))

      // timestamp_micros(x) <op> t  →  x <op> (t's µs as long)
      case m: MicrosToTimestamp
          if (lit.dataType == TimestampType || lit.dataType == TimestampNTZType) &&
            m.child.dataType == LongType =>
        done(m.child, Literal(lit.value, LongType))

      // cast(ntz as timestamp, zone) <op> t  →  ntz <op> t + fixed offset
      case c: Cast
          if c.child.dataType == TimestampNTZType && c.dataType == TimestampType &&
            lit.dataType == TimestampType =>
        fixedOffsetMicros(c.timeZoneId).flatMap { off =>
          addExact(lit.value.asInstanceOf[Long], off)
            .flatMap(v => done(c.child, Literal(v, TimestampNTZType)))
        }

      // cast(timestamp as ntz, zone): the mirror direction
      case c: Cast
          if c.child.dataType == TimestampType && c.dataType == TimestampNTZType &&
            lit.dataType == TimestampNTZType =>
        fixedOffsetMicros(c.timeZoneId).flatMap { off =>
          subExact(lit.value.asInstanceOf[Long], off)
            .flatMap(v => done(c.child, Literal(v, TimestampType)))
        }

      // (x ± k) <op> v  →  x <op> v ∓ k   (longs only, checked)
      case s: Subtract if s.dataType == LongType =>
        (s.right, lit.value) match {
          case (Literal(k: Long, LongType), v: Long) =>
            addExact(v, k).flatMap(nv => done(s.left, Literal(nv, LongType)))
          case _ => None
        }
      case a: Add if a.dataType == LongType =>
        ((a.left, a.right) match {
          case (Literal(k: Long, LongType), x) => Some((x, k))
          case (x, Literal(k: Long, LongType)) => Some((x, k))
          case _ => None
        }).flatMap { case (x, k) =>
          subExact(lit.value.asInstanceOf[Long], k)
            .flatMap(nv => done(x, Literal(nv, LongType)))
        }

      // cast(x:long as double) <op> v:double  →  integer bound on x
      case c: Cast
          if c.child.dataType == LongType && c.dataType == DoubleType &&
            lit.dataType == DoubleType =>
        val v = lit.value.asInstanceOf[Double]
        // beyond 2^53 long→double is lossy; bail rather than reason about it
        if (!java.lang.Double.isFinite(v) || math.abs(v) >= (1L << 53).toDouble) None
        else {
          val floor = math.floor(v).toLong
          val ceil = math.ceil(v).toLong
          op match {
            case Ge => done(c.child, Literal(ceil, LongType))  // x >= v ⇔ x >= ⌈v⌉
            case Gt => done(c.child, Literal(floor, LongType)) // x > v  ⇔ x > ⌊v⌋
            case Le => done(c.child, Literal(floor, LongType)) // x <= v ⇔ x <= ⌊v⌋
            case Lt => done(c.child, Literal(ceil, LongType))  // x < v  ⇔ x < ⌈v⌉
            case Eq if floor == ceil => done(c.child, Literal(floor, LongType))
            case _ => None // non-integral equality: leave as-is
          }
        }

      // (x div d) <op> v  for literal d > 0, v > 0: exact under trunc and
      // floor division at these signs (see scaladoc); equality bails (the
      // layer is not injective)
      case d: IntegralDivide if d.dataType == LongType && !op.isEquality =>
        (d.right, lit.value) match {
          case (Literal(k: Long, LongType), v: Long) if k > 0 && v > 0 =>
            op match {
              case Ge => mulExact(v, k).flatMap(nv => done(d.left, Literal(nv, LongType)))            // x div d >= v ⇔ x >= v*d
              case Gt => addExact(v, 1).flatMap(mulExact(_, k)).flatMap(nv =>                          // x div d > v ⇔ x >= (v+1)*d
                Some(unwrap(d.left, Ge, Literal(nv, LongType))
                  .getOrElse(Ge.build(d.left, Literal(nv, LongType)))))
              case Lt => mulExact(v, k).flatMap(nv => done(d.left, Literal(nv, LongType)))            // x div d < v ⇔ x < v*d
              case Le => addExact(v, 1).flatMap(mulExact(_, k)).flatMap(nv =>                          // x div d <= v ⇔ x < (v+1)*d
                Some(unwrap(d.left, Lt, Literal(nv, LongType))
                  .getOrElse(Lt.build(d.left, Literal(nv, LongType)))))
              case Eq => None
            }
          case _ => None
        }

      case _ => None
    }
  }

  /** µs offset of a FIXED-offset zone (None for DST zones, where the
    * ntz↔tz cast is not a constant shift and the rewrite would be wrong).
    */
  private def fixedOffsetMicros(timeZoneId: Option[String]): Option[Long] =
    timeZoneId.flatMap { tz =>
      try {
        val rules = java.time.ZoneId.of(tz).getRules
        if (rules.isFixedOffset)
          Some(rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds * 1000000L)
        else None
      } catch { case _: Exception => None }
    }

  private def addExact(a: Long, b: Long): Option[Long] =
    try Some(Math.addExact(a, b)) catch { case _: ArithmeticException => None }
  // Math.subtractExact rather than addExact(a, -b): -Long.MinValue silently
  // overflows back to MinValue, which would emit a wrong bound instead of bailing.
  private def subExact(a: Long, b: Long): Option[Long] =
    try Some(Math.subtractExact(a, b)) catch { case _: ArithmeticException => None }
  private def mulExact(a: Long, b: Long): Option[Long] =
    try Some(Math.multiplyExact(a, b)) catch { case _: ArithmeticException => None }
}
