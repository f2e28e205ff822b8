package graft.catalyst

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions

/** Native tokenize_ru expression: behavior pinned against the composed
  * built-in pipeline + Scala stemmer, null safety, SQL registration, and
  * whole-stage-codegen participation.
  */
class TokenizeStemSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Comparison scaffolding only — main paths use the native expression. */
  private val ruStemArrayUdf = udf((toks: Seq[String]) =>
    if (toks == null) null else toks.map(TextFunctions.ruStem))

  test("matches composed lexemes+stem pipeline on real documents") {
    TokenizeStem.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val native = docs
      .select($"doc_id", TokenizeStem.tokenizeRu($"text").as("lex"))
    val composed = docs.select($"doc_id",
      array_sort(array_distinct(ruStemArrayUdf(
        TextFunctions.lexemes($"text")))).as("lex"))
    val diff = native.as("n").join(composed.as("c"), "doc_id")
      .filter($"n.lex" =!= $"c.lex")
    assert(diff.isEmpty)
  }

  test("stems russian text and drops stopwords") {
    TokenizeStem.register(spark)
    val out = Seq("Студенты и студентами СТОЛАМИ на паре")
      .toDF("t")
      .select(TokenizeStem.tokenizeRu($"t")).as[Seq[String]].head()
    // студенты/студентами stem together; 'и'/'на' are stopwords
    assert(out.contains("студент") && out.contains("стол") &&
      !out.contains("и") && !out.contains("на"))
    assert(out == out.sorted && out.distinct == out)
  }

  test("null input yields null; non-string input rejected at analysis") {
    TokenizeStem.register(spark)
    val r = Seq[Option[String]](None).toDF("t")
      .select(TokenizeStem.tokenizeRu($"t")).head()
    assert(r.isNullAt(0))
    val err = intercept[Exception] {
      spark.range(1).select(expr("tokenize_ru(id)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("tokenize_ru") ||
      err.getMessage.toLowerCase.contains("string"))
  }

  test("stays inside whole-stage codegen (no UDF eval node)") {
    TokenizeStem.register(spark)
    val exec = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TokenizeStem.tokenizeRu($"text"))
      .queryExecution.executedPlan
    // the `*(n)` prefix in the plan string marks a WholeStageCodegen span
    val codegenNodes = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenNodes.nonEmpty, exec.toString)
    assert(!exec.toString.contains("BatchEvalUDF") &&
      !exec.toString.contains("ScalaUDF"))
  }
}
