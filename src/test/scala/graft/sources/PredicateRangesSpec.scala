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
    assert(b(not(col("x") > 5)).isEmpty) // NOT
    assert(b(col("x") > col("y")).isEmpty) // col-vs-col
    // AND keeps the understood side, drops the rest
    assert(b(col("x") > 5 && (col("y") === "s")) ==
      Map("x" -> Bound(6, Max)))
  }

  test("OR unions per-column bounds, only where both branches bound") {
    // disjoint ranges → the hull (wider than the union, never narrower)
    assert(b((col("x") >= 2 && col("x") <= 4) ||
             (col("x") >= 90 && col("x") <= 95)) ==
      Map("x" -> Bound(2, 95)))
    assert(b(col("x") === 3 || col("x") === 7) == Map("x" -> Bound(3, 7)))
    // a column bounded on only ONE branch is unconstrained: a row may
    // satisfy the other branch with any value of it
    assert(b(col("x") > 5 || col("y") < 2).isEmpty)
    // y bounded only on the left branch → dropped; x hulls to the full range
    assert(b((col("x") > 5 && col("y") < 9) || (col("x") < 2)) ==
      Map("x" -> Bound(Min, Max)))
    // complementary halves degrade to the trivial full range — sound
    assert(b((col("x") > 5) || (col("x") < 2)) ==
      Map("x" -> Bound(Min, Max)))
    // AND of an OR with an outer range intersects back down
    assert(b((col("x") === 3 || col("x") === 7) && col("x") <= 5) ==
      Map("x" -> Bound(3, 5)))
  }

  test("IN bounds min..max of the literal list; BETWEEN desugars to AND") {
    assert(b(col("x").isin(7, 3, 11)) == Map("x" -> Bound(3, 11)))
    assert(b(col("x").isin(5L)) == Map("x" -> Bound(5, 5)))
    assert(b(col("x").isin(3, "s")).isEmpty) // mixed literals: no bound
    assert(b(col("x").isin()).isEmpty)
    assert(b(col("x").between(4, 9)) == Map("x" -> Bound(4, 9)))
    assert(b(col("x").isin(2, 8) && col("y") >= 1) ==
      Map("x" -> Bound(2, 8), "y" -> Bound(1, Max)))
  }

  private def nn(c: Column) = PredicateRanges.extractNullness(c)
  private def N(mustNull: Set[String], mustNonNull: Set[String]) =
    PredicateRanges.Nullness(mustNull, mustNonNull)
  private val none = Set.empty[String]

  test("nullness: isNull/isNotNull and null-rejecting comparisons") {
    assert(nn(col("x").isNull) == N(Set("x"), none))
    assert(nn(col("x").isNotNull) == N(none, Set("x")))
    // comparisons reject NULL on BOTH direct column arguments
    assert(nn(col("x") > 5) == N(none, Set("x")))
    assert(nn(col("x") === col("y")) == N(none, Set("x", "y")))
    assert(nn(col("x").isin(1, 2)) == N(none, Set("x")))
    assert(nn(col("x") =!= 3) == N(none, Set("x")))
    // null-SAFE equality is not null-rejecting
    assert(nn(col("x") <=> lit(3)) == N(none, none))
    // a column under a function contributes nothing: coalesce may map
    // NULL to a matching value
    import org.apache.spark.sql.functions.coalesce
    assert(nn(coalesce(col("x"), lit(0)) > 5) == N(none, none))
    // NOT flips the nullness claim (¬(x IS NULL) ⇒ x IS NOT NULL), and
    // NOT over a comparison still rejects NULL (NOT(NULL) is NULL)
    assert(nn(not(col("x").isNull)) == N(none, Set("x")))
    assert(nn(not(col("x").isNotNull)) == N(Set("x"), none))
    assert(nn(not(col("x") > 5)) == N(none, Set("x")))
    // De Morgan: ¬(x IS NULL ∨ y IS NULL) = ¬(x IS NULL) ∧ ¬(y IS NULL)
    assert(nn(not(col("x").isNull || col("y").isNull)) ==
      N(none, Set("x", "y")))
  }

  test("nullness: AND unions, OR intersects") {
    assert(nn(col("x").isNull && col("y") > 3) ==
      N(Set("x"), Set("y")))
    assert(nn(col("x").isNull || col("x").isNull) == N(Set("x"), none))
    // constraint on one OR branch only → dropped
    assert(nn(col("x").isNull || col("y") > 3) == N(none, none))
    assert(nn((col("x") > 1 && col("y").isNotNull) ||
              (col("x") < 0 && col("y").isNotNull)) ==
      N(none, Set("x", "y")))
  }

  private def pts(c: Column) = PredicateRanges.extractPoints(c)
  import PredicateRanges.Point

  test("points: equality and IN contribute, AND intersects, OR unions") {
    assert(pts(col("x") === 3) == Map("x" -> Set(Point(false, "3"))))
    assert(pts(lit("a") === col("x")) == Map("x" -> Set(Point(true, "a"))))
    assert(pts(col("x").isin(1, 2)) ==
      Map("x" -> Set(Point(false, "1"), Point(false, "2"))))
    // genuinely contradictory equalities → empty set (prune everything)
    assert(pts(col("x") === 3 && col("x") === 4) ==
      Map("x" -> Set.empty[Point]))
    assert(pts(col("x") === "a" && col("x") === "b") ==
      Map("x" -> Set.empty[Point]))
    assert(pts(col("x") === 3 || col("x") === 4) ==
      Map("x" -> Set(Point(false, "3"), Point(false, "4"))))
    // OR keeps only columns constrained on BOTH branches
    assert(pts(col("x") === 3 || col("y") === 4).isEmpty)
  }

  test("points: AND intersects by coercion value, not structural equality") {
    // `c = 3 AND c = '3'` is satisfiable (rows with c = 3 match both under
    // Spark's string/numeric coercion) — a structural Point intersection
    // would be empty and unsoundly prune every bloom-bearing file
    assert(pts(col("x") === 3 && col("x") === "3") ==
      Map("x" -> Set(Point(false, "3"), Point(true, "3"))))
    // non-canonical numeric renderings coerce to the same value
    assert(pts(col("x") === 3 && col("x") === "03")("x").nonEmpty)
    assert(pts(col("x") === 3 && col("x") === "3.0")("x").nonEmpty)
    assert(pts(col("x") === "3" && col("x") === "3.0")("x").nonEmpty)
    assert(pts(col("x") === 3 && col("x") === " 3")("x").nonEmpty)
    // distinct values stay empty — including across kinds: a non-numeric
    // string casts to NULL against a numeric column (never TRUE) and
    // string-vs-string equality is uncoerced
    assert(pts(col("x") === 3 && col("x") === "4")("x").isEmpty)
    assert(pts(col("x") === 3 && col("x") === "abc")("x").isEmpty)
    assert(pts(col("x") === "3.5" && col("x") === 3)("x").isEmpty)
  }

  private def sb(c: Column) = PredicateRanges.extractStr(c)
  import PredicateRanges.StrBound

  test("string bounds: comparisons, AND intersect, OR hull, IN") {
    assert(sb(col("s") >= "b") == Map("s" -> StrBound(Some("b"), None)))
    assert(sb(col("s") > "b") == Map("s" -> StrBound(Some("b"), None)))
    assert(sb(lit("b") > col("s")) == Map("s" -> StrBound(None, Some("b"))))
    assert(sb(col("s") <= "m") == Map("s" -> StrBound(None, Some("m"))))
    assert(sb(col("s") === "k") == Map("s" -> StrBound(Some("k"), Some("k"))))
    assert(sb(col("s") >= "b" && col("s") < "m") ==
      Map("s" -> StrBound(Some("b"), Some("m"))))
    // AND across columns keeps both; integral comparisons contribute nothing
    assert(sb(col("s") >= "b" && col("x") > 5) ==
      Map("s" -> StrBound(Some("b"), None)))
    // OR hulls, and only columns bounded on BOTH branches
    assert(sb((col("s") >= "b" && col("s") <= "c") ||
              (col("s") >= "x" && col("s") <= "y")) ==
      Map("s" -> StrBound(Some("b"), Some("y"))))
    assert(sb(col("s") >= "b" || col("t") >= "x").isEmpty)
    assert(sb(col("s").isin("m", "b", "x")) ==
      Map("s" -> StrBound(Some("b"), Some("x"))))
    // mixed-type IN voids the bound
    assert(sb(col("s").isin("b", 3)).isEmpty)
  }

  test("string bounds order by UTF-8 bytes, not UTF-16 code units") {
    // U+10000 (surrogate pair, UTF-8 F0 90 80 80) sorts ABOVE U+E000
    // (UTF-8 EE 80 80) in byte order, but BELOW it in Java's natural
    // String order — the hull must use byte order or a supplementary-
    // plane key falls outside its own bound
    val supp = new String(Character.toChars(0x10000))
    val bmp = "x"
    // Java/UTF-16 order disagrees: the pair's high surrogate 0xD800
    // compares below 0xE000, while the UTF-8 bytes compare above
    assert(bmp > supp)
    assert(PredicateRanges.Utf8Ordering.compare(bmp, supp) < 0)
    assert(sb(col("s").isin(supp, bmp)) ==
      Map("s" -> StrBound(Some(bmp), Some(supp))))
    // and the prefix embedding agrees with the same ordering
    import graft.sources.TxLogTable.strEncFloor
    assert(strEncFloor(bmp) < strEncFloor(supp))
  }

  test("exactBounds declines strict comparisons at the Long saturation " +
      "boundary; overflowing temporal literals contribute no bound") {
    // col < Long.MinValue matches NOTHING, but decr clamps — the
    // may-match hull (MinValue, MinValue) is sound for pruning yet a lie
    // to the file-DROP path, which must therefore decline
    assert(PredicateRanges.exactBounds(col("a") < Long.MinValue).isEmpty)
    assert(PredicateRanges.exactBounds(col("a") > Long.MaxValue).isEmpty)
    assert(PredicateRanges.exactBounds(lit(Long.MaxValue) < col("a")).isEmpty)
    assert(PredicateRanges.exactBounds(lit(Long.MinValue) > col("a")).isEmpty)
    // non-boundary strict comparisons still characterize exactly
    assert(PredicateRanges.exactBounds(col("a") < 5L) ==
      Some(Map("a" -> Bound(Long.MinValue, 4L))))
    // the may-match hull keeps its (sound, wide) clamped bound
    assert(PredicateRanges.extract(col("a") < Long.MinValue) ==
      Map("a" -> Bound(Long.MinValue, Long.MinValue)))
    // Instant.MAX micros overflow: no bound, no exception
    assert(PredicateRanges.extract(
      col("ts") < lit(java.time.Instant.MAX)).isEmpty)
    assert(PredicateRanges.exactBounds(
      col("ts") < lit(java.time.Instant.MAX)).isEmpty)
    // a representable instant still bounds (micros domain)
    val i = java.time.Instant.ofEpochSecond(10L, 2000L)
    assert(PredicateRanges.extract(col("ts") <= lit(i)) ==
      Map("ts" -> Bound(Long.MinValue, 10000002L)))
  }
}
