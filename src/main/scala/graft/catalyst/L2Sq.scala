package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native squared-L2 distance over two `array<double>` columns — the PQ
  * hot path: the encode computes (vectors × codes × subspaces) of these,
  * and the composed form (`aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)),
  * 0.0, _+_)`) is higher-order functions, which are `CodegenFallback` in
  * Spark: per row it pays interpreted lambda dispatch plus an intermediate
  * array. One fused loop with a single accumulator instead — same
  * promotion rule as [[CosineSim]] (native pays when per-element work is
  * tiny next to lambda dispatch; measured on pq_codes/pq_adc_topk).
  *
  * Bit-compatibility with the composed form (the oracle contract): the
  * accumulator folds `acc + (x-y)*(x-y)` left-to-right, operation-for-
  * operation the fold the lambda form performs — pinned by L2SqSpec.
  * Null semantics match too: null input, unequal lengths (zip_with pads
  * with null) or a null element → null; empty arrays → 0.0 (the fold's
  * initial value).
  */
case class L2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"l2_sq expects ARRAY<DOUBLE>, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    L2SqUtil.eval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.catalyst.L2SqUtil.eval($a, $b);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.doubleValue();
      }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "l2_sq"
}

/** Static helper invoked from generated code (object methods get static
  * forwarders, so janino sees a plain static call).
  */
object L2SqUtil {
  def eval(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

object L2Sq {
  /** Column-API form; requires [[register]] once per session (Spark 4's
    * node-based Column has no public Expression bridge, so the registry +
    * `call_function` is the supported route).
    */
  def l2sq(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("l2_sq", a, b)

  /** Register `l2_sq` for Column-API and spark.sql usage. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_sq", exprs => L2Sq(exprs.head, exprs(1)), "scala_udf")
}
