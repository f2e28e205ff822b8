package graft.catalyst

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The merge count must equal `size(array_intersect(a, b))` on every
  * sorted-distinct input — checked on the real corpus pair shapes and on
  * generated token sets (including empty and disjoint ones).
  */
class SortedIntersectCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("equals size(array_intersect) on real corpus token arrays") {
    SortedIntersectCount.register(spark)
    import graft.functions.TextFunctions.tokens
    val arrs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"),
        sort_array(array_distinct(tokens(col("text")))).as("toks"))
    // every consecutive-id pair — a dense sample of real near-dup overlaps
    val pairs = arrs.as("a").join(arrs.as("b"),
      col("a.doc_id") + 1 === col("b.doc_id"))
    val diff = pairs.filter(
      SortedIntersectCount.sortedIntersectCount(col("a.toks"), col("b.toks"))
        =!= size(array_intersect(col("a.toks"), col("b.toks"))))
    assert(diff.isEmpty)
    assert(pairs.count() > 0)
  }

  test("generated sorted-distinct sets: equal counts, null input -> null") {
    SortedIntersectCount.register(spark)
    import spark.implicits._
    val wordGen = Gen.resize(6,
      Gen.listOf(Gen.oneOf("a", "b", "cc", "d", "e", "ff", "g")))
      .map(_.distinct.sorted)
    (1 to 20).foreach { i =>
      val (xs, ys) = Gen.zip(wordGen, wordGen)
        .pureApply(Gen.Parameters.default, Seed(7L + i))
      val row = Seq((xs, ys)).toDF("a", "b")
        .select(
          SortedIntersectCount.sortedIntersectCount($"a", $"b").as("n"),
          size(array_intersect($"a", $"b")).as("e"))
        .collect()(0)
      assert(row.getInt(0) == row.getInt(1), s"$xs vs $ys")
      assert(row.getInt(0) == xs.toSet.intersect(ys.toSet).size)
    }
    val nullRow = Seq(Seq("a")).toDF("b")
      .select(SortedIntersectCount.sortedIntersectCount(
        lit(null).cast("array<string>"), $"b"))
      .collect()(0)
    assert(nullRow.isNullAt(0))
  }
}
