package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native cosine similarity over two `array<double>` columns.
  *
  * The composed form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)` three
  * times + sqrt/divide) is built from higher-order functions, which are
  * `CodegenFallback` in Spark — every row pays interpreted lambda dispatch
  * and three intermediate arrays (the zip_with products). This expression
  * is one fused loop over the raw ArrayData with three scalar accumulators:
  * no allocation, and the call from generated code is a single static
  * invocation that stays inside the WholeStageCodegen span. Same promotion
  * rationale as `tokenize_ru`/`winnow_fingerprint`: measurable codegen win,
  * not vanity — it sits in the hot path of every ANN query and each k-means
  * assignment iteration (k cosines per row per iteration).
  *
  * Bit-compatibility with the composed form (the oracle contract): each
  * accumulator folds left-to-right exactly as the three separate
  * `aggregate` calls do, and the final `dot / (sqrt(na) * sqrt(nb))`
  * matches `dot(a,b) / (norm(a) * norm(b))` operation-for-operation —
  * pinned by CosineSimSpec. Null semantics match too: null input, unequal
  * lengths (zip_with pads with null) or a null element → null.
  */
case class CosineSim(left: Expression, right: Expression)
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
        s"cosine_sim expects ARRAY<DOUBLE>, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSimUtil.eval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.catalyst.CosineSimUtil.eval($a, $b);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.doubleValue();
      }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

/** Static helper invoked from generated code (object methods get static
  * forwarders, so janino sees a plain static call).
  */
object CosineSimUtil {
  def eval(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // Spark's non-ANSI Divide yields NULL on a ZERO divisor even for
    // doubles (not Infinity/NaN) — a zero vector or empty array must match
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }
}

object CosineSim {
  /** Column-API form; requires [[register]] once per session (Spark 4's
    * node-based Column has no public Expression bridge, so the registry +
    * `call_function` is the supported route).
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("cosine_sim", a, b)

  /** Register `cosine_sim` for Column-API and spark.sql usage. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs.head, exprs(1)), "scala_udf")
}
