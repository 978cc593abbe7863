package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class VictorPurpuraSpec extends AnyFunSuite {

  import VictorPurpura.distance

  test("base cases: empty trains cost = insertions/deletions") {
    assert(distance(Array.empty, Array.empty, 1.0) === 0.0)
    assert(distance(Array(1.0, 2.0), Array.empty, 1.0) === 2.0)
    assert(distance(Array.empty, Array(1.0, 2.0, 3.0), 1.0) === 3.0)
  }

  test("identical trains have distance 0; q=0 degenerates to count diff") {
    assert(distance(Array(1.0, 5.0, 9.0), Array(1.0, 5.0, 9.0), 0.5) === 0.0)
    assert(distance(Array(1.0, 2.0, 3.0), Array(100.0, 200.0), 0.0) === 1.0)
  }

  test("small shift costs q*dt when cheaper than delete+insert") {
    // one spike moved by 0.5 with q=1: move cost 0.5 < 2.0
    assert(distance(Array(1.0), Array(1.5), 1.0) === 0.5)
    // moved far: delete+insert (2.0) wins
    assert(distance(Array(1.0), Array(100.0), 1.0) === 2.0)
  }

  test("properties: symmetry, non-negativity, bounded by n+m") {
    val genTrain = Gen.listOf(Gen.chooseNum(0.0, 100.0)).map(_.sorted.toArray)
    val prop = Prop.forAll(genTrain, genTrain, Gen.chooseNum(0.01, 2.0)) {
      (a: Array[Double], b: Array[Double], q: Double) =>
        val d1 = distance(a, b, q)
        val d2 = distance(b, a, q)
        math.abs(d1 - d2) < 1e-9 && d1 >= 0 && d1 <= a.length + b.length + 1e-9
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(100))
    assert(res.passed, res.status.toString)
  }
}
