package graft.dsl

import graft.SparkSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class QDslSpec extends SparkSuite {

  import spark.implicits._

  private lazy val df = Seq(
    (1L, 10.0, "A", "x1"),
    (2L, 20.0, "A", "y2"),
    (3L, 30.0, "B", "x3"),
    (4L, 40.0, "B", "zz"),
    (5L, 50.0, "C", "x5")
  ).toDF("id", "v", "cls", "name")

  test("scalar equality and isin") {
    assert(Q.q(df, QAnd("cls" -> QCond(QEq("A")))).count() == 2)
    assert(Q.q(df, QAnd("id" -> QCond(QIsIn(Seq(1, 3, 5))))).count() == 3)
  }

  test("op map: ge/lt combined on one column") {
    val got = Q.q(df, QAnd("v" -> QCond(Seq(QGe(20.0), QLt(50.0))))).select("id")
      .as[Long].collect().sorted
    assert(got.toSeq == Seq(2L, 3L, 4L))
  }

  test("ne and gt") {
    val got = Q.q(df, QAnd("cls" -> QCond(QNe("B")), "v" -> QCond(QGt(10.0))))
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(2L, 5L))
  }

  test("regex is unanchored (re.search semantics)") {
    assert(Q.q(df, QAnd("name" -> QCond(QRegex("x")))).count() == 3)
    assert(Q.q(df, QAnd("name" -> QCond(QRegex("^z")))).count() == 1)
  }

  test("list of specs = OR of row sets") {
    val spec = QOr(Seq(
      QAnd("cls" -> QCond(QEq("A"))),
      QAnd("v" -> QCond(QGe(50.0)))))
    assert(Q.q(df, spec).count() == 3)
  }

  test("empty spec selects everything") {
    assert(Q.q(df, QTrue).count() == 5)
    assert(Q.q(df, QAnd(Map.empty[String, QCond])).count() == 5)
  }

  // ---- isSubfilter: soundness against a brute-force row-set oracle ----

  private val rows: Seq[Map[String, Any]] =
    for (i <- 0 until 60) yield Map[String, Any](
      "a" -> (i % 7), "b" -> (i % 5).toDouble, "s" -> ("v" + (i % 4)))

  private def evalOp(v: Any, op: QOp): Boolean = {
    def num(x: Any): Double = x match {
      case d: Double => d; case i: Int => i.toDouble; case l: Long => l.toDouble
      case _ => Double.NaN
    }
    def cmp(x: Any, y: Any): Int = (x, y) match {
      case (a: String, b: String) => a.compareTo(b)
      case _ => java.lang.Double.compare(num(x), num(y))
    }
    op match {
      case QEq(w) => cmp(v, w) == 0
      case QNe(w) => cmp(v, w) != 0
      case QLe(w) => cmp(v, w) <= 0
      case QLt(w) => cmp(v, w) < 0
      case QGe(w) => cmp(v, w) >= 0
      case QGt(w) => cmp(v, w) > 0
      case QIsIn(ws) => ws.exists(w => cmp(v, w) == 0)
      case QRegex(p) => p.r.findFirstIn(v.toString).isDefined
    }
  }

  private def evalSpec(row: Map[String, Any], spec: QSpec): Boolean = spec match {
    case QTrue => true
    case QAnd(conds) => conds.forall { case (k, c) => c.ops.forall(evalOp(row(k), _)) }
    case QOr(specs) => specs.isEmpty || specs.exists(evalSpec(row, _))
    case QAllOf(specs) => specs.forall(evalSpec(row, _))
  }

  private val genOp: Gen[QOp] = Gen.oneOf(
    Gen.chooseNum(0, 7).map(v => QEq(v)),
    Gen.chooseNum(0, 7).map(v => QNe(v)),
    Gen.chooseNum(0, 7).map(v => QLe(v)),
    Gen.chooseNum(0, 7).map(v => QLt(v)),
    Gen.chooseNum(0, 7).map(v => QGe(v)),
    Gen.chooseNum(0, 7).map(v => QGt(v)),
    Gen.listOfN(3, Gen.chooseNum(0, 7)).map(vs => QIsIn(vs)))

  private val genCond: Gen[QCond] =
    Gen.choose(1, 2).flatMap(n => Gen.listOfN(n, genOp).map(QCond(_)))

  private val genAnd: Gen[QAnd] = for {
    useA <- Gen.oneOf(true, false)
    useB <- Gen.oneOf(true, false)
    ca <- genCond
    cb <- genCond
  } yield QAnd(
    (if (useA) Map("a" -> ca) else Map.empty[String, QCond]) ++
      (if (useB) Map("b" -> cb) else Map.empty[String, QCond]))

  private val genSpec: Gen[QSpec] = Gen.frequency(
    5 -> genAnd,
    1 -> Gen.listOfN(2, genAnd).map(QOr(_)))

  test("isSubfilter is sound: isSubfilter(a,b) implies rows(a) subset of rows(b)") {
    val prop = Prop.forAll(genSpec, genSpec) { (a: QSpec, b: QSpec) =>
      if (Q.isSubfilter(a, b)) {
        val ra = rows.filter(evalSpec(_, a))
        val rb = rows.filter(evalSpec(_, b)).toSet
        ra.forall(rb.contains)
      } else true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("isSubfilter: reference examples (cache.py narrower/broader semantics)") {
    // {"k": 1} is narrower than {"k": [1, 2]}
    assert(Q.isSubfilter(
      QAnd("k" -> QCond(QEq(1))),
      QAnd("k" -> QCond(QIsIn(Seq(1, 2))))))
    // lt 3 narrower than lt 4
    assert(Q.isSubfilter(
      QAnd("k" -> QCond(QLt(3))),
      QAnd("k" -> QCond(QLt(4)))))
    // any filter is narrower than the empty filter
    assert(Q.isSubfilter(QAnd("k" -> QCond(QEq(1))), QTrue))
    // the empty filter is NOT narrower than a real one
    assert(!Q.isSubfilter(QTrue, QAnd("k" -> QCond(QEq(1)))))
    // broader isin is not a subfilter
    assert(!Q.isSubfilter(
      QAnd("k" -> QCond(QIsIn(Seq(1, 2)))),
      QAnd("k" -> QCond(QEq(1)))))
    // extra constrained key stays narrower
    assert(Q.isSubfilter(
      QAnd("k" -> QCond(QEq(1)), "j" -> QCond(QEq(2))),
      QAnd("k" -> QCond(QEq(1)))))
  }

  test("isSubfilter: ne implication requires comparable values") {
    // comparable and unequal: eq 5 does imply ne 7
    assert(Q.isSubfilter(
      QAnd("k" -> QCond(QEq(5))),
      QAnd("k" -> QCond(QNe(7)))))
    // incomparable types (Int vs non-numeric String) must NOT imply ne:
    // Spark's coercing comparison could match rows veq would miss
    assert(!Q.isSubfilter(
      QAnd("k" -> QCond(QEq(5))),
      QAnd("k" -> QCond(QNe("abc")))))
    // isin with any incomparable member: not implied either
    assert(!Q.isSubfilter(
      QAnd("k" -> QCond(QIsIn(Seq(5, "abc")))),
      QAnd("k" -> QCond(QNe("xyz")))))
    // strings are comparable to strings: eq "a" implies ne "b"
    assert(Q.isSubfilter(
      QAnd("k" -> QCond(QEq("a"))),
      QAnd("k" -> QCond(QNe("b")))))
  }
}
