package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextFunctions

/** Native Catalyst expression for the full T1 pipeline *with* Russian
  * stemming: lowercase → split on non-letter/digit → drop stopwords/short
  * tokens → light RU suffix-strip → distinct → sort.
  *
  * Promotion path per SURVEY §2.9/§7: the unstemmed tokenizer stays composed
  * from built-ins ([[graft.functions.TextFunctions.lexemes]], oracle-checked);
  * the stemmed variant needs per-token Scala logic, and a native expression
  * beats a Scala UDF because (a) codegen calls a static method directly — no
  * Row encoder boundary, no closure serialization per task, and (b) it stays
  * inside the WholeStageCodegen span instead of forcing a `BatchEvalUDF`
  * break. Registered for SQL as `tokenize_ru`.
  */
case class TokenizeStem(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"tokenize_ru expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TokenizeStemUtil.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.catalyst.TokenizeStemUtil.eval($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : TokenizeStem = copy(child = newChild)

  override def prettyName: String = "tokenize_ru"
}

/** Static evaluation helper invoked from generated code (object methods get
  * static forwarders, so janino sees a plain static call).
  */
object TokenizeStemUtil {
  private val stopwords = TextFunctions.Stopwords.toSet
  private val splitRe = TextFunctions.TokenSplitRe.r

  def eval(s: UTF8String): ArrayData = {
    val toks = splitRe.split(s.toString.toLowerCase)
    val out = scala.collection.mutable.SortedSet.empty[String]
    toks.foreach { t =>
      if (t.length >= 2 && !stopwords.contains(t))
        out += TextFunctions.ruStem(t)
    }
    new GenericArrayData(
      out.toArray.map(UTF8String.fromString).asInstanceOf[Array[Any]])
  }
}

object TokenizeStem {
  /** Column-API form; requires [[register]] once per session (Spark 4's
    * node-based Column has no public Expression bridge, so the registry +
    * `call_function` is the supported route).
    */
  def tokenizeRu(c: Column): Column =
    org.apache.spark.sql.functions.call_function("tokenize_ru", c)

  /** Register `tokenize_ru` for spark.sql usage. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tokenize_ru", exprs => TokenizeStem(exprs.head), "scala_udf")
}
