package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.internal.{ColumnNode, Literal => NodeLit, UnresolvedAttribute => NodeAttr, UnresolvedFunction => NodeFn}

/** Conservative per-column bounds extracted from a predicate `Column` —
  * the analysis that lets `TxLogTable.snapshotWhere` skip files for
  * ARBITRARY conjunctive range predicates instead of the explicit
  * (column, lo, hi) form. Mirrors what Catalyst's data-source filter
  * pushdown derives for parquet row groups, applied one level up at the
  * manifest.
  *
  * Spark 4's `Column` is a tree of `ColumnNode`s (the pre-analysis form
  * shared with Connect), and both the node types and `Column.node` are
  * `private[sql]` — hence this object lives in the
  * `org.apache.spark.sql` namespace, the established shim pattern for
  * extension libraries that need analyzer-level access.
  *
  * Soundness rule: an extracted bound may be WIDER than the true
  * constraint, never narrower — a file is only skipped when the bound
  * proves no row can match. Anything not understood (OR trees, NOT, IN,
  * non-literal comparisons, functions over the column) contributes no
  * bound, so those predicates simply don't prune; the caller always
  * re-applies the full predicate to the surviving rows.
  */
object PredicateRanges {

  final case class Bound(lo: Long, hi: Long) {
    def intersect(o: Bound): Bound =
      Bound(math.max(lo, o.lo), math.min(hi, o.hi))
  }

  /** Bounds implied by `pred` per referenced column. Only AND-trees of
    * binary comparisons against integral literals contribute.
    */
  def extract(pred: Column): Map[String, Bound] = walk(pred.node)

  private def colName(n: ColumnNode): Option[String] = n match {
    case a: NodeAttr => Some(a.nameParts.mkString("."))
    case _ => None
  }

  private def litLong(n: ColumnNode): Option[Long] = n match {
    case l: NodeLit => l.value match {
      case v: Int => Some(v.toLong)
      case v: Long => Some(v)
      case v: Short => Some(v.toLong)
      case v: Byte => Some(v.toLong)
      case _ => None // doubles/strings: no bound, never a rounded one
    }
    case _ => None
  }

  // saturating arithmetic at the Long extremes keeps strict bounds sound
  private def incr(v: Long) = if (v == Long.MaxValue) v else v + 1
  private def decr(v: Long) = if (v == Long.MinValue) v else v - 1

  // `col OP lit` contributes fwd(lit); `lit OP col` contributes rev(lit);
  // anything else nothing. At most one orientation can match.
  private def cmp(a: ColumnNode, b: ColumnNode)
                 (fwd: Long => Bound)(rev: Long => Bound)
      : Map[String, Bound] = {
    val f = for (n <- colName(a); v <- litLong(b)) yield Map(n -> fwd(v))
    val r = for (n <- colName(b); v <- litLong(a)) yield Map(n -> rev(v))
    f.orElse(r).getOrElse(Map.empty)
  }

  private def walk(n: ColumnNode): Map[String, Bound] = n match {
    case f: NodeFn => (f.functionName, f.arguments) match {
      case ("and", Seq(l, r)) =>
        val a = walk(l); val b = walk(r)
        (a.keySet ++ b.keySet).iterator.map { k =>
          k -> ((a.get(k), b.get(k)) match {
            case (Some(x), Some(y)) => x.intersect(y)
            case (Some(x), None) => x
            case (None, Some(y)) => y
            case _ => Bound(Long.MinValue, Long.MaxValue)
          })
        }.toMap
      case (">", Seq(a, b)) =>
        cmp(a, b)(v => Bound(incr(v), Long.MaxValue))(
          v => Bound(Long.MinValue, decr(v)))
      case (">=", Seq(a, b)) =>
        cmp(a, b)(v => Bound(v, Long.MaxValue))(
          v => Bound(Long.MinValue, v))
      case ("<", Seq(a, b)) =>
        cmp(a, b)(v => Bound(Long.MinValue, decr(v)))(
          v => Bound(incr(v), Long.MaxValue))
      case ("<=", Seq(a, b)) =>
        cmp(a, b)(v => Bound(Long.MinValue, v))(
          v => Bound(v, Long.MaxValue))
      case ("=" | "==", Seq(a, b)) =>
        cmp(a, b)(v => Bound(v, v))(v => Bound(v, v))
      case _ => Map.empty // or / not / in / udf: no pruning, still correct
    }
    case _ => Map.empty
  }
}
