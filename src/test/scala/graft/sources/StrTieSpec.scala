package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the claim [[TxLogTable.strEncCeil]]'s scaladoc
  * derives: the `:spre:` 7-byte-prefix string encoding is constructed so
  * that an encoding TIE at a sorted-file boundary PROVES value order —
  * `strEncCeil(a) == strEncFloor(b)` implies `a <= b` in unsigned byte
  * order. That fact is what lets [[TxLogTable.rangeOrder]]'s
  * single-sort-column tie pass arm string-sorted multi-file directories
  * without a row-group probe. Also checks the bracketing facts pruning
  * rests on: floor monotone, ceil a true upper bound, and
  * `ceil(a) < floor(b) ⇒ a < b` (strict disjointness).
  */
class StrTieSpec extends AnyFunSuite {
  import TxLogTable.{strEncCeil, strEncFloor}

  /** Unsigned lexicographic byte order — parquet BINARY stats order and
    * UTF-8 code-point order alike. */
  private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  // Byte strings biased toward the interesting region: short (<= 9 bytes,
  // straddling the 7-byte window), tiny alphabet (forces shared prefixes
  // and exact ties), and NUL bytes included (the padding-ambiguity case).
  private val byteStrGen: Gen[Array[Byte]] = for {
    len <- Gen.choose(0, 9)
    bytes <- Gen.listOfN(len,
      Gen.oneOf(Seq[Byte](0, 0, 1, 2, 97, 98, 255.toByte)))
  } yield bytes.toArray

  private def pairs(n: Int): Seq[(Array[Byte], Array[Byte])] =
    (0 until n).map { i =>
      val g = Gen.zip(byteStrGen, byteStrGen)
      g.pureApply(Gen.Parameters.default, Seed(4242L + i))
    }

  test("floor is monotone and floor <= ceil") {
    pairs(4000).foreach { case (a, b) =>
      if (cmp(a, b) <= 0)
        assert(strEncFloor(a) <= strEncFloor(b),
          s"floor not monotone on ${a.toSeq} <= ${b.toSeq}")
      assert(strEncFloor(a) <= strEncCeil(a))
    }
  }

  test("ceil bounds every value at-or-above: a <= x implies interval overlap") {
    // ceil(a) is an upper bound for a itself, and monotone against floor:
    // a <= x  ⇒  floor(x) <= ceil(x) and floor(a) <= floor(x); the pruning
    // form actually used is the contrapositive below.
    pairs(4000).foreach { case (a, b) =>
      if (strEncCeil(a) < strEncFloor(b))
        assert(cmp(a, b) < 0,
          s"disjoint encodings but ${a.toSeq} >= ${b.toSeq}")
    }
  }

  test("encoding tie proves order: ceil(a) == floor(b) implies a <= b") {
    // The rangeOrder arming fact. Random pairs rarely tie, so ALSO
    // construct ties directly: for each a, every b whose floor equals
    // ceil(a) by construction (a itself, a ++ suffix, NUL-padded forms).
    var ties = 0
    pairs(6000).foreach { case (a, b) =>
      if (strEncCeil(a) == strEncFloor(b)) {
        ties += 1
        assert(cmp(a, b) <= 0,
          s"tie but ${a.toSeq} > ${b.toSeq}: armed order would be wrong")
      }
    }
    // constructed ties: untruncated NUL-free a ties with a and a++suffix
    val cons = Seq[Array[Byte]](
      Array(), Array(97), Array(97, 98), Array(1, 2, 97, 98, 99, 100, 101))
    cons.foreach { a =>
      Seq(a, a ++ Array[Byte](0), a ++ Array[Byte](0, 5)).foreach { b =>
        if (strEncCeil(a) == strEncFloor(b)) {
          ties += 1
          assert(cmp(a, b) <= 0, s"constructed tie ${a.toSeq} > ${b.toSeq}")
        }
      }
    }
    assert(ties > 0, "property vacuous: no tie exercised")
  }

  test("rangeOrder arms string boundary ties — single sort col only") {
    import TxLogTable.{FileEntry, nullsKey, rangeOrder, sortKeyRangeOf, strKey}
    def entry(rel: String, min: String, max: String) =
      FileEntry(rel, Map(
        strKey("s") -> (strEncFloor(min), strEncCeil(max)),
        nullsKey("s") -> (0L, 0L)))
    // files [alpha..mango] then [mango..zulu]: boundary value shared —
    // the exact tie the old exact-integral-only rule refused to arm
    val tied = Seq(
      entry("a.parquet", "alpha", "mango"),
      entry("b.parquet", "mango", "zulu"))
    def order(es: Seq[FileEntry], single: Boolean) =
      rangeOrder(es.map(e => e -> sortKeyRangeOf(e, "s")),
        singleSortCol = single)
    assert(order(tied, single = true).map(_.map(_.rel)) ==
      Some(Seq("a.parquet", "b.parquet")))
    // with secondary sort columns a straddling key could interleave —
    // the same tie must disarm
    assert(order(tied, single = false).isEmpty)
    // truncated shared prefix: ceil bumps above floor, so a genuine
    // overlap ("mangofruitX" vs "mangofruitY" share 7 bytes) never
    // reads as a tie — disarms
    val truncated = Seq(
      entry("a.parquet", "alpha", "mangofruitX"),
      entry("b.parquet", "mangofruitY", "zulu"))
    assert(order(truncated, single = true).isEmpty)
    // NUL inversion: fileA max "ab\0" really sorts ABOVE fileB min "ab";
    // the NUL bump keeps ceil strictly above floor, so no false arm
    val inverted = Seq(
      FileEntry("a.parquet", Map(
        strKey("s") -> (strEncFloor("aa"),
          strEncCeil(Array[Byte](97, 98, 0))),
        nullsKey("s") -> (0L, 0L))),
      entry("b.parquet", "ab", "zz"))
    assert(order(inverted, single = true).isEmpty)
  }

  test("NUL-padding ambiguity cannot fake a tie") {
    // "ab\0" > "ab" but both FLOOR-encode equally; if ceil("ab\0") were
    // its floor, files [.., "ab\0"] then ["ab", ..] would wrongly arm.
    val abNul = Array[Byte](97, 98, 0)
    val ab = Array[Byte](97, 98)
    assert(cmp(abNul, ab) > 0)
    assert(strEncFloor(abNul) == strEncFloor(ab))
    // the NUL bump: ceil strictly above, so no tie arms this inversion
    assert(strEncCeil(abNul) > strEncFloor(ab))
  }
}
