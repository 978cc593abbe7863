package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `array_dot(a, b)`: fused dot product of two numeric arrays in double
  * precision, sequential left-to-right accumulation — bit-identical to
  * `aggregate(zip_with(a, b, (x, y) -> double(x)*double(y)), 0D, +)` but
  * compiled by whole-stage codegen into a single loop with no intermediate
  * array allocation. This is the scalar kernel of the similarity-search
  * path (SURVEY north-star ops): at 100 TB the brute-force/IVF re-rank
  * evaluates it millions of times per partition, so it must stay inside
  * codegen (custom `Expression` with `doGenCode`, preferred over a Scala
  * UDF which would box every element).
  *
  * Length mismatch → the shorter length wins (zip_with-with-nulls would
  * null the tail products; embeddings are fixed-width so this is moot).
  * Null array → null. Null elements are not expected (parquet float lists
  * are non-null here) and read as 0.
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"array_dot expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (ad, bd) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(ad.numElements(), bd.numElements())
    val (lf, rf) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) ad.getFloat(i).toDouble else ad.getDouble(i)
      val y = if (rf) bd.getFloat(i).toDouble else bd.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Registration: per-session (`GraftFunctions.register(spark)`) or via
  * `spark.sql.extensions=graft.functions.GraftExtensions` at session build
  * (the SparkSessionExtensions route for clusters).
  */
object GraftFunctions {
  // builders index children directly; a wrong argument count must surface
  // as a clean analysis error, not an IndexOutOfBoundsException from the
  // builder body. The expected signature rides in the functionName slot
  // (the template's only free-text position); docroot must be the real
  // docs base — the template renders it as a URL prefix.
  private def arity(name: String, sig: String, n: Int)(
      children: Seq[Expression]): Seq[Expression] = {
    if (children.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name` (expected $sig)",
          "expectedNum" -> n.toString,
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    children
  }

  val fns: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (children: Seq[Expression]) => {
        val c = arity("array_dot", "array_dot(a, b)", 2)(children)
        ArrayDot(c(0), c(1))
      }),
    (
      FunctionIdentifier("vp_distance"),
      new ExpressionInfo(classOf[VictorPurpuraDistance].getName, "vp_distance"),
      (children: Seq[Expression]) => {
        val c = arity("vp_distance", "vp_distance(a, b, q)", 3)(children)
        VictorPurpuraDistance(c(0), c(1), c(2))
      }),
    (
      FunctionIdentifier("topk_by"),
      new ExpressionInfo(classOf[TopKBy].getName, "topk_by"),
      (children: Seq[Expression]) => {
        val c = arity("topk_by", "topk_by(score, id, k)", 3)(children)
        // raw AggregateFunction: the analyzer wraps it in AggregateExpression
        TopKBy(c(0), c(1), c(2))
      }),
    // Spark's runtime-filter bloom expressions are internal-only (no SQL
    // registration upstream); exposing them lets the decontamination path
    // build the filter in-plan via a scalar subquery — the exact shape
    // Spark's own InjectRuntimeFilter rule produces, no driver collect.
    (
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (children: Seq[Expression]) => {
        val c = arity("bloom_agg", "bloom_agg(hash, n_items, n_bits)", 3)(children)
        org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          c(0), c(1), c(2), 0, 0)
      }),
    (
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (children: Seq[Expression]) => {
        val c =
          arity("bloom_might_contain", "bloom_might_contain(bloom, hash)", 2)(children)
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(c(0), c(1))
      }))

  def register(spark: SparkSession): Unit = {
    fns.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    // idempotent: extraOptimizations is a plain Seq, guard against dupes
    if (!spark.experimental.extraOptimizations.contains(graft.plans.MicrosPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.MicrosPushdown
  }
}

class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.fns.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.MicrosPushdown)
  }
}
