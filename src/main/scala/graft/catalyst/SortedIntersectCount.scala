package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Intersection size of two SORTED, DISTINCT string arrays by two-pointer
  * merge — value-equal to `size(array_intersect(a, b))` on such inputs
  * (both sides distinct ⇒ intersect emits each common element once; sorted
  * ⇒ one linear walk finds them all).
  *
  * Why native: `ArrayIntersect` builds a hash set PER CALL — in the
  * LSH-gated Jaccard verify that is one allocation + rehash per candidate
  * pair, millions of times per query, which is exactly the "per-call hash
  * allocation dominates" cost measured when per-pair intersect was first
  * rejected for `dd_jaccard`. The merge walk does zero allocation and one
  * binary `UTF8String.compareTo` per step (the same ordering `sort_array`
  * produced, so the walk is sound). Per-element work is a cheap compare —
  * the regime where a native expression pays (see the promotion rule at
  * `TextQueries.statelessBands`).
  *
  * PRECONDITION (caller-enforced, as `exactJaccardOnPairs` does via
  * `sort_array(array_distinct(...))`): both arrays ascending, no
  * duplicates, no null elements. Null INPUT → null, as the composed form.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects ARRAY<STRING>, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCountUtil.eval(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.catalyst.SortedIntersectCountUtil.eval($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

object SortedIntersectCountUtil {
  def eval(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getUTF8String(i)
      val y = b.getUTF8String(j)
      val cmp = x.compareTo(y)
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}

object SortedIntersectCount {
  /** Column-API form; requires [[register]] once per session. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.functions
      .call_function("sorted_intersect_count", a, b)

  /** Register `sorted_intersect_count` for Column-API and SQL usage. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => SortedIntersectCount(exprs.head, exprs(1)), "scala_udf")
}
