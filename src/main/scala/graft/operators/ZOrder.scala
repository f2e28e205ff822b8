package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering key over two integral dimensions —
  * the public Delta/Iceberg `OPTIMIZE ZORDER BY` idea: rows sorted by the
  * interleaved-bit key land in files that cover small hyper-rectangles of
  * the (a, b) space instead of thin slabs of one dimension, so manifest
  * min/max stats ([[graft.sources.TxLogTable.candidateFiles]]) prune scans
  * on EITHER column. Linear clustering (plain sort by a, then b) gives
  * perfect pruning on `a` and none on `b`; the z-curve trades a little of
  * `a`'s locality for locality in both — the right layout when a 100 TB
  * table serves range queries on two independent keys (user × time,
  * tenant × id).
  *
  * Everything here is a deterministic per-row expression (codegen, no
  * shuffle); the one shuffle in a z-order rewrite is the
  * `repartitionByRange` on the computed key.
  */
object ZOrder {

  val Bits = 16

  /** Scale an integral column to the [0, 2^Bits) grid over [mn, mx].
    * Double-based scaling: `(v - mn) * 65535` overflows Long once the
    * column spans more than ~2^47 (epoch-nanos spans do); the double
    * rounding is deterministic and grid-cell precision is all a
    * clustering key needs.
    */
  def gridCell(c: Column, mn: Long, mx: Long): Column =
    if (mx <= mn) lit(0L)
    else least(
      lit(((1L << Bits) - 1).toDouble),
      (c - lit(mn)).cast("double") / lit((mx - mn).toDouble) *
        lit(((1L << Bits) - 1).toDouble)).cast("long")

  /** Interleave the low [[Bits]] bits of `a` and `b`: bit i of `a` goes to
    * position 2i, bit i of `b` to 2i+1 — the Morton code. Unrolled to a
    * fixed OR-chain of shifts so whole-stage codegen sees straight-line
    * long arithmetic.
    */
  def interleave(a: Column, b: Column): Column =
    (0 until Bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(a.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(b.bitwiseAND(lit(1L << i)), i + 1))
    }

  /** The z-value of (`a`, `b`) given their committed value ranges. */
  def zValue(a: Column, aMin: Long, aMax: Long,
             b: Column, bMin: Long, bMax: Long): Column =
    interleave(gridCell(a, aMin, aMax), gridCell(b, bMin, bMax))
}
