package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property test at the expression level: for random data values and
  * random comparison literals, the rewritten predicate evaluates exactly
  * like the original on every realistic chain shape — no Spark jobs, so
  * thousands of cases run in milliseconds.
  */
class MicrosPushdownPropSpec extends AnyFunSuite {

  private val Origin = graft.Tables.EventsEpochMicros

  private def rewriteCond(cond: Expression, rel: LocalRelation): Expression =
    MicrosPushdown(Filter(cond, rel)) match {
      case Filter(c, _) => c
      case other => fail(s"unexpected plan: $other")
    }

  private def evalBoth(
      cond: Expression, rel: LocalRelation, value: Any): (Any, Any, Expression) = {
    val rewritten = rewriteCond(cond, rel)
    val a = BindReferences.bindReference(cond, rel.output).eval(InternalRow(value))
    val b = BindReferences.bindReference(rewritten, rel.output).eval(InternalRow(value))
    (a, b, rewritten)
  }

  private def ops(l: Expression, r: Expression): Seq[Expression] = Seq(
    GreaterThanOrEqual(l, r), GreaterThan(l, r),
    LessThanOrEqual(l, r), LessThan(l, r), EqualTo(l, r),
    // literal-on-the-left mirror
    GreaterThanOrEqual(r, l), LessThan(r, l))

  // data domain: micros around the origin ± 40 days, plus boundary jitters
  private val genMicros: Gen[Long] = Gen.oneOf(
    Gen.choose(Origin - 3456000000000L, Origin + 3456000000000L),
    Gen.choose(-1000000L, 1000000L).map(_ + Origin))
  private val genRel: Gen[Long] = Gen.choose(-3456000000000L, 3456000000000L)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("NTZ chain: unix_micros(cast(ts)) - origin cmp long literal") {
    val ts = AttributeReference("ts", TimestampNTZType)()
    val rel = LocalRelation(ts)
    val chain = Subtract(
      UnixMicros(Cast(ts, TimestampType, Some("UTC"))), Literal(Origin))
    check(Prop.forAll(genMicros, genRel) { (micros, v) =>
      ops(chain, Literal(v)).forall { cmp =>
        val (a, b, rw) = evalBoth(cmp, rel, micros)
        a == b
      }
    })
    // and the rewrite really reaches the bare column
    val (_, _, rw) = evalBoth(GreaterThanOrEqual(chain, Literal(0L)), rel, Origin)
    assert(rw.isInstanceOf[GreaterThanOrEqual] &&
      rw.asInstanceOf[GreaterThanOrEqual].left == ts, rw.toString)
  }

  test("nanos chain: unix_micros(timestamp_micros(ts div 1000)) - origin cmp long") {
    val ts = AttributeReference("ts", LongType)()
    val rel = LocalRelation(ts)
    val chain = Subtract(
      UnixMicros(MicrosToTimestamp(IntegralDivide(ts, Literal(1000L)))),
      Literal(Origin))
    val genNanos = genMicros.map(m => m * 1000L + 337L)
    check(Prop.forAll(genNanos, genRel) { (nanos, v) =>
      ops(chain, Literal(v)).forall { cmp =>
        val (a, b, _) = evalBoth(cmp, rel, nanos)
        a == b
      }
    })
  }

  test("double chain: cast(micros - origin as double) cmp fractional double") {
    val ts = AttributeReference("ts", TimestampNTZType)()
    val rel = LocalRelation(ts)
    val chain = Cast(
      Subtract(UnixMicros(Cast(ts, TimestampType, Some("UTC"))), Literal(Origin)),
      DoubleType)
    val genV: Gen[Double] = Gen.oneOf(
      genRel.map(_.toDouble),
      genRel.map(_ + 0.5),
      genRel.map(_ - 0.25),
      Gen.const(0.0))
    check(Prop.forAll(genMicros, genV) { (micros, v) =>
      ops(chain, Literal(v)).forall { cmp =>
        val (a, b, _) = evalBoth(cmp, rel, micros)
        a == b
      }
    })
  }

  test("div rewrite bails on Long.MaxValue literal instead of wrapping") {
    val ts = AttributeReference("ts", LongType)()
    val rel = LocalRelation(ts)
    val chain = UnixMicros(MicrosToTimestamp(IntegralDivide(ts, Literal(1L))))
    // x div 1 <= Long.MaxValue is always true; a wrapping v+1 would have
    // rewritten it to x < Long.MinValue (always false)
    val cmp = LessThanOrEqual(chain, Literal(Long.MaxValue))
    val (a, b, _) = evalBoth(cmp, rel, 12345L)
    assert(a == true && b == true)
  }

  test("guards: DST zone and non-anchored arithmetic stay untouched") {
    val ts = AttributeReference("ts", TimestampNTZType)()
    val rel = LocalRelation(ts)
    val dst = GreaterThanOrEqual(
      Subtract(UnixMicros(Cast(ts, TimestampType, Some("America/New_York"))),
        Literal(Origin)),
      Literal(0L))
    // the UnixMicros layer unwraps but the DST cast must survive
    assert(rewriteCond(dst, rel).exists {
      case c: Cast => c.timeZoneId.contains("America/New_York")
      case _ => false
    })
    val x = AttributeReference("x", LongType)()
    val relX = LocalRelation(x)
    val plain = GreaterThan(Subtract(x, Literal(5L)), Literal(3L))
    assert(rewriteCond(plain, relX) == plain) // no micros anchor → untouched
  }
}
