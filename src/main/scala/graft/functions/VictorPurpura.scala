package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Victor-Purpura spike-train distance (reference:
  * external/bluecv/comparison.py:17-21 via elephant): minimal cost to
  * transform one spike train into another with unit insert/delete cost and
  * move cost q·|Δt| — an edit-distance dynamic program, O(n·m) with
  * sequential row dependencies. This is genuinely imperative (SURVEY §7.3:
  * a relational encoding would need an iterative self-join per DP row), so
  * the kernel is a plain Scala loop — but it is surfaced as the codegen
  * [[VictorPurpuraDistance]] expression (not a boxed Scala UDF): whole-
  * stage codegen reads the train arrays straight off ArrayData with no
  * per-element boxing or UDF serialization. Trains are per-gid arrays,
  * bounded by the cohort selection, so the quadratic cost is local to a
  * task and never shuffles.
  */
object VictorPurpura {

  def distance(a: Array[Double], b: Array[Double], q: Double): Double = {
    val (n, m) = (a.length, b.length)
    if (n == 0) return m.toDouble
    if (m == 0) return n.toDouble
    var prev = Array.tabulate(m + 1)(_.toDouble)
    var cur = new Array[Double](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i.toDouble
      var j = 1
      while (j <= m) {
        val move = prev(j - 1) + q * math.abs(a(i - 1) - b(j - 1))
        val del = prev(j) + 1.0
        val ins = cur(j - 1) + 1.0
        cur(j) = math.min(move, math.min(del, ins))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }
}

/** `vp_distance(a, b, q)`: Victor-Purpura distance of two double-array
  * spike trains at move cost q. Codegen calls the shared static kernel on
  * the unboxed `toDoubleArray()` views — the generated plan has no
  * ScalaUDF node, so a16b-style re-ranks stay inside WholeStageCodegen.
  */
case class VictorPurpuraDistance(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vp_distance"

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (arr(first.dataType) && arr(second.dataType) && third.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"vp_distance expects (array<double>, array<double>, double), got " +
          s"${first.dataType} / ${second.dataType} / ${third.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any, q: Any): Any =
    VictorPurpura.distance(
      a.asInstanceOf[ArrayData].toDoubleArray(),
      b.asInstanceOf[ArrayData].toDoubleArray(),
      q.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, q) =>
      s"${ev.value} = graft.functions.VictorPurpura.distance(" +
        s"$a.toDoubleArray(), $b.toDoubleArray(), $q);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): VictorPurpuraDistance =
    copy(first = newFirst, second = newSecond, third = newThird)
}
