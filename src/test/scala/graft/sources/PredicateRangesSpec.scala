package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.graft.PredicateRanges
import org.scalatest.funsuite.AnyFunSuite

/** Pure extractor tests: every supported comparison orientation yields the
  * tight bound, every unsupported shape yields NO bound (never a wrong
  * one) — the soundness property file skipping rests on.
  */
class PredicateRangesSpec extends AnyFunSuite {
  import PredicateRanges.Bound

  private def b(c: Column) = PredicateRanges.extract(c)
  private val Max = Long.MaxValue
  private val Min = Long.MinValue

  test("comparison orientations and conjunctions intersect") {
    assert(b(col("x") > 5) == Map("x" -> Bound(6, Max)))
    assert(b(lit(5) > col("x")) == Map("x" -> Bound(Min, 4)))
    assert(b(col("x") >= 5) == Map("x" -> Bound(5, Max)))
    assert(b(col("x") < 5) == Map("x" -> Bound(Min, 4)))
    assert(b(lit(5) < col("x")) == Map("x" -> Bound(6, Max)))
    assert(b(col("x") <= 5) == Map("x" -> Bound(Min, 5)))
    assert(b(col("x") === 7) == Map("x" -> Bound(7, 7)))
    assert(b(lit(7L) === col("x")) == Map("x" -> Bound(7, 7)))
    assert(b(col("x") >= 5 && col("x") <= 9) == Map("x" -> Bound(5, 9)))
    assert(b(col("x") > 2 && col("y") < 5 && col("x") < 9) ==
      Map("x" -> Bound(3, 8), "y" -> Bound(Min, 4)))
    // contradictory conjunction → empty interval (lo > hi): prunes all
    val Bound(lo, hi) = b(col("x") > 9 && col("x") < 3)("x")
    assert(lo > hi)
  }

  test("unsupported shapes contribute nothing — never a wrong bound") {
    assert(b(col("x") === "s").isEmpty) // non-integral literal
    assert(b(col("x") > lit(1.5)).isEmpty) // double literal: no rounding
    assert(b((col("x") > 5) || (col("x") < 2)).isEmpty) // OR
    assert(b(not(col("x") > 5)).isEmpty) // NOT
    assert(b(col("x") > col("y")).isEmpty) // col-vs-col
    // AND keeps the understood side, drops the rest
    assert(b(col("x") > 5 && (col("y") === "s")) ==
      Map("x" -> Bound(6, Max)))
  }
}
