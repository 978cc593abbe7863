package graft.engine

import graft.SparkSuite

/** The lazily-valued frame map behind calculateFeatures: key enumeration
  * must not construct plans, value access must memoize, and iteration
  * must force everything (the strict-dump contract).
  */
class LazyFramesSpec extends SparkSuite {

  private def counted() = {
    val counts = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    val lf = LazyFrames(Seq(
      "a" -> (() => { counts("a") += 1; spark.range(1).toDF() }),
      "b" -> (() => { counts("b") += 1; spark.range(2).toDF() })))
    (lf, counts)
  }

  test("key enumeration and contains never build a frame") {
    val (lf, counts) = counted()
    assert(lf.keySet === Set("a", "b"))
    assert(lf.size === 2)
    assert(lf.contains("a") && !lf.contains("c"))
    assert(counts("a") === 0 && counts("b") === 0)
  }

  test("accessing one key builds only that frame, once") {
    val (lf, counts) = counted()
    assert(lf("a").count() === 1)
    assert(lf("a").count() === 1) // memoized — thunk not re-run
    assert(counts("a") === 1 && counts("b") === 0)
  }

  test("iteration forces every frame (strict-dump contract)") {
    val (lf, counts) = counted()
    assert(lf.values.map(_.count()).sum === 3)
    assert(counts("a") === 1 && counts("b") === 1)
  }

  test("mapFrames stays lazy and composes the transform") {
    val (lf, counts) = counted()
    val mapped = lf.mapFrames((_, df) => df.limit(1))
    assert(counts("a") === 0 && counts("b") === 0)
    assert(mapped("b").count() === 1)
    assert(counts("b") === 1 && counts("a") === 0)
  }

  test("updated/+ with a DataFrame keeps siblings unconstructed") {
    val (lf, counts) = counted()
    val plus = lf + ("c" -> spark.range(3).toDF())
    assert(counts("a") === 0 && counts("b") === 0)
    assert(plus.keySet === Set("a", "b", "c"))
    assert(plus("c").count() === 3)
    assert(counts("a") === 0 && counts("b") === 0)
    // replacement keeps the other frame lazy too
    val repl = lf.updated("a", spark.range(5).toDF())
    assert(repl("a").count() === 5)
    assert(counts("a") === 0 && counts("b") === 0)
  }

  test("duplicate names are rejected") {
    intercept[IllegalArgumentException] {
      LazyFrames(Seq(
        "x" -> (() => spark.range(1).toDF()),
        "x" -> (() => spark.range(1).toDF())))
    }
  }
}
