package graft.catalyst

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Native winnow_fingerprint: equivalence with the composed higher-order-
  * function form (the spec the oracle replays), edge cases, codegen.
  */
class WinnowFingerprintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The composed built-in form the native expression replaces. */
  private val composed = expr(
    """array_join(array_sort(array_distinct(transform(
        sequence(1, greatest(
          size(transform(sequence(1, greatest(length(text) - 7, 1)),
               i -> md5(substr(text, i, 8)))) - 3, 1)),
        j -> array_min(slice(
          transform(sequence(1, greatest(length(text) - 7, 1)),
            i -> md5(substr(text, i, 8))), j, 4))))), '|')""")

  test("matches the composed form on real documents") {
    WinnowFingerprint.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs
      .select($"doc_id", WinnowFingerprint.winnow($"text").as("native"),
        composed.as("ref"))
      .filter($"native" =!= $"ref")
    assert(diff.isEmpty)
  }

  test("edge cases: empty, shorter than k, shorter than k+w, multibyte") {
    WinnowFingerprint.register(spark)
    val cases = Seq("", "ab", "exactly8", "elevenchars", "тексты на кириллице",
      "a" * 8, "a" * 12)
    val out = cases.toDF("text")
      .select(WinnowFingerprint.winnow($"text").as("native"),
        composed.as("ref"))
      .collect()
    out.zip(cases).foreach { case (r, c) =>
      assert(r.getString(0) == r.getString(1), s"case '$c'")
    }
  }

  test("null in, null out; stays inside whole-stage codegen") {
    WinnowFingerprint.register(spark)
    val r = Seq[Option[String]](None).toDF("text")
      .select(WinnowFingerprint.winnow($"text")).head()
    assert(r.isNullAt(0))
    val exec = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(WinnowFingerprint.winnow($"text"))
      .queryExecution.executedPlan
    assert(exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, exec.toString)
    assert(!exec.toString.contains("ScalaUDF"))
  }
}
