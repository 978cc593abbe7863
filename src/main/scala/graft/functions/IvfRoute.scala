package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types._

/** The two-level IVF router's quantizer state, distributed as ONE Spark
  * broadcast: aligned by super POSITION — `superIds(i)`/`superCents(i)`
  * is super i, `kidIds(i)(j)`/`kidCents(i)(j)` its j-th child cell.
  * Broadcast (torrent, once per executor) is the correct distribution
  * for quantizer-sized static state: plan literals re-serialize with
  * every task batch and break past ~thousands of cells, and a broadcast
  * JOIN materializes the children arrays into every joined row — the
  * r15 RouteProfile measured that copy at ~√cells·dims·16 B PER QUERY
  * ROW (42 s for 20k queries at 65k cells), which this expression
  * eliminates entirely.
  */
case class IvfRouterState(
    superIds: Array[Int],
    superCents: Array[Array[Double]],
    kidIds: Array[Array[Int]],
    kidCents: Array[Array[Array[Double]]])

/** `ivf_route2(q_emb)`: per-row TWO-LEVEL IVF routing as one scalar
  * expression — picks the top-2 super-cells by dot product over the
  * broadcast super-centroids, then the best child cell of those two
  * supers, in tight JVM loops over primitive arrays. Append-mode legal
  * (a deterministic scalar over one row: no join, no aggregate, no
  * exchange) and bit-identical to the batch hierarchical route: the
  * dots accumulate left-to-right exactly like [[ArrayDot]], and both
  * argmax levels break ties by SMALLEST id under
  * `SQLOrderingUtil.compareDoubles` — the `max_by(struct(dp, -id))`
  * algebra of `routeQueries`/the old join form, re-expressed as loops.
  * CodegenFallback: the eval IS the kernel (2·√cells fused dots); there
  * is no per-element expression tree for codegen to beat.
  */
case class IvfTwoLevelRoute(
    child: Expression,
    state: Broadcast[IvfRouterState])
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_route2"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_route2 expects array<float|double>, got $other")
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // (dp, id) strictly better than (bestDp, bestId): larger dot wins,
  // ties to the smaller id — max_by(struct(dp, -id)) exactly, including
  // NaN/-0.0 handling via Spark's own double ordering
  private def better(dp: Double, id: Int, bestDp: Double, bestId: Int): Boolean = {
    val c = SQLOrderingUtil.compareDoubles(dp, bestDp)
    c > 0 || (c == 0 && id < bestId)
  }

  // ArrayDot's exact accumulation: left-to-right, shorter length wins
  private def dot(q: Array[Double], c: Array[Double]): Double = {
    val n = math.min(q.length, c.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += q(i) * c(i); i += 1 }
    acc
  }

  override def nullSafeEval(q: Any): Any = {
    val ad = q.asInstanceOf[ArrayData]
    val st = state.value
    val n = ad.numElements()
    val qd = new Array[Double](n)
    var i = 0
    if (isFloat) while (i < n) { qd(i) = ad.getFloat(i).toDouble; i += 1 }
    else while (i < n) { qd(i) = ad.getDouble(i); i += 1 }
    // level 1: top-2 supers
    var b1 = -1; var d1 = 0.0
    var b2 = -1; var d2 = 0.0
    i = 0
    while (i < st.superIds.length) {
      val dp = dot(qd, st.superCents(i))
      if (b1 < 0 || better(dp, st.superIds(i), d1, st.superIds(b1))) {
        b2 = b1; d2 = d1; b1 = i; d1 = dp
      } else if (b2 < 0 || better(dp, st.superIds(i), d2, st.superIds(b2))) {
        b2 = i; d2 = dp
      }
      i += 1
    }
    // level 2: best cell across both supers' children
    var bestCell = 0; var bestDp = 0.0; var found = false
    def scan(s: Int): Unit = if (s >= 0) {
      val ids = st.kidIds(s); val cents = st.kidCents(s)
      var j = 0
      while (j < ids.length) {
        val dp = dot(qd, cents(j))
        if (!found || better(dp, ids(j), bestDp, bestCell)) {
          found = true; bestCell = ids(j); bestDp = dp
        }
        j += 1
      }
    }
    scan(b1); scan(b2)
    require(found, "ivf_route2: empty hierarchy")
    bestCell
  }

  override protected def withNewChildInternal(newChild: Expression): IvfTwoLevelRoute =
    copy(child = newChild)
}
