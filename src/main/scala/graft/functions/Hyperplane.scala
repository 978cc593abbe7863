package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `hyperplane_bands(embedding)`: per-row random-hyperplane LSH band keys
  * over a BROADCAST ±1 plane matrix — the banded bit signature
  * [[graft.queries.Vectors.lshSignatures]] derives, re-expressed with the
  * plane coefficients as executor state instead of plan literals. Emits
  * `array<struct<band int, bkey string>>`, one struct per band, `bkey` the
  * band's planesPerBand sign bits as a '1'/'0' string.
  *
  * Why not literals: the literal form plans bands·planesPerBand
  * `array_dot(embedding, array(<dims doubles>))` projections — at the
  * measured auto banding that is tens of thousands of literal nodes that
  * every Catalyst pass over every consuming action re-walks (v9's warm
  * cost was DRIVER PLANNING, not compute), and past a few thousand planes
  * the plan itself stops scaling (the same ceiling that moved the IVF
  * routers onto [[IvfRouterState]] broadcasts). One broadcast ships the
  * matrix once per executor; the plan carries one node.
  *
  * Bit-parity contract (HyperplaneSigParitySpec pins it): each projection
  * accumulates LEFT-TO-RIGHT over `min(|embedding|, |plane|)` elements
  * with float→double widening — [[ArrayDot]]'s exact loop — and the sign
  * bit is `SQLOrderingUtil.compareDoubles(dp, 0.0) >= 0`, the comparison
  * Spark itself generates for the literal form's `s >= 0` (NaN sorts
  * high, -0.0 == 0.0). CodegenFallback: the eval IS the kernel
  * (bands·planesPerBand fused dots per row); there is no per-element
  * expression tree for codegen to beat.
  */
case class HyperplaneBands(
    child: Expression,
    state: Broadcast[Array[Array[Double]]],
    bands: Int,
    planesPerBand: Int)
  extends UnaryExpression with CodegenFallback {

  require(bands > 0 && planesPerBand > 0,
    s"hyperplane_bands: need bands > 0 and planesPerBand > 0, " +
      s"got $bands x $planesPerBand")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("bkey", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "hyperplane_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bands expects array<float|double>, got $other")
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(q: Any): Any = {
    val ad = q.asInstanceOf[ArrayData]
    val planes = state.value
    val n = ad.numElements()
    val qd = new Array[Double](n)
    var i = 0
    if (isFloat) while (i < n) { qd(i) = ad.getFloat(i).toDouble; i += 1 }
    else while (i < n) { qd(i) = ad.getDouble(i); i += 1 }
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val bits = new Array[Byte](planesPerBand)
      var r = 0
      while (r < planesPerBand) {
        val plane = planes(planesPerBand * b + r)
        // ArrayDot's exact accumulation: left-to-right, shorter length wins
        val m = math.min(qd.length, plane.length)
        var acc = 0.0
        var j = 0
        while (j < m) { acc += qd(j) * plane(j); j += 1 }
        bits(r) =
          if (SQLOrderingUtil.compareDoubles(acc, 0.0) >= 0) '1'.toByte
          else '0'.toByte
        r += 1
      }
      out(b) = InternalRow(b, UTF8String.fromBytes(bits))
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}
