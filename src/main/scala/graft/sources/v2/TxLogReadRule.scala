package graft.sources.v2

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Not, Or}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, Filter, LogicalPlan, MergeIntoTable, Project, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.unsafe.types.UTF8String

/** Analyzer rule (installed by `graft.GraftExtensions`) that replaces a
  * txlog DataSourceV2 relation with the table's native parquet logical
  * plan — the same replace-at-resolution trick Delta uses so catalog
  * tables read through the ordinary FileSourceScan: vectorized parquet,
  * whole-stage codegen, parquet filter pushdown, and NO InternalRow→Row
  * conversion (what the V1Scan fallback pays).
  *
  * A Filter directly above the relation is additionally translated (as far
  * as its shape allows — conservative, same contract as the V1 connector's
  * pushdown) into a predicate `Column` for `snapshotWhere`, so MANIFEST
  * pruning (range stats, null counts, partition paths, Blooms) happens for
  * SQL reads too. The original Filter stays on top — untranslated
  * conjuncts narrow nothing at the manifest but still filter rows, so
  * results never change.
  *
  * Top-down transform: the Filter case must see the relation BENEATH it
  * before the bare-relation case rewrites it.
  */
case class TxLogReadRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    // Row-level DML keeps its target as a V2 relation: DeleteFromTable's
    // target IS a child of the command node (unlike the write commands,
    // whose `table` field sits outside `children`), and the V2 strategy
    // must see the relation to route SupportsDelete — splicing the scan
    // plan under it would fail planning.
    case d: DeleteFromTable => d
    case u: UpdateTable => u
    case m: MergeIntoTable => m
    case _ => rewrite(plan)
  }

  private def rewrite(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      case f @ Filter(cond, rel: DataSourceV2Relation)
          if rel.table.isInstanceOf[TxLogV2Table] && f.resolved =>
        val tbl = rel.table.asInstanceOf[TxLogV2Table]
        aligned(tbl.snapshotDF(toPredicate(cond)), rel.output)
          .map(Filter(cond, _)).getOrElse(f)
      case rel: DataSourceV2Relation
          if rel.table.isInstanceOf[TxLogV2Table] =>
        val tbl = rel.table.asInstanceOf[TxLogV2Table]
        aligned(tbl.snapshotDF(None), rel.output).getOrElse(rel)
      // The V1 `format("txlog")` surface — the discovery path a casual
      // user finds first — gets the same splice: the PrunedFilteredScan
      // fallback pays an InternalRow→Row conversion at the scan top
      // (`TxLogRelation.buildScan`'s `.rdd`), so replace it with the
      // native parquet plan whenever the extension is installed. Filter
      // translation and manifest pruning are identical to the V2 case.
      case f @ Filter(cond,
          lr: org.apache.spark.sql.execution.datasources.LogicalRelation)
          if lr.relation.isInstanceOf[graft.sources.TxLogRelation] &&
            !lr.isStreaming && f.resolved =>
        val rel = lr.relation.asInstanceOf[graft.sources.TxLogRelation]
        aligned(v1SnapshotDF(rel, toPredicate(cond)), lr.output)
          .map(Filter(cond, _)).getOrElse(f)
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
          if lr.relation.isInstanceOf[graft.sources.TxLogRelation] &&
            !lr.isStreaming =>
        val rel = lr.relation.asInstanceOf[graft.sources.TxLogRelation]
        aligned(v1SnapshotDF(rel, None), lr.output).getOrElse(lr)
    }

  // the V1 relation's snapshot as a native-parquet DataFrame (manifest
  // pruning included), mirroring TxLogV2Table.snapshotDF
  private def v1SnapshotDF(rel: graft.sources.TxLogRelation,
                           pred: Option[Column]) = {
    val t = graft.sources.TxLogTable(spark, rel.root)
    pred match {
      case Some(p) => t.snapshotWhere(rel.schema, p, rel.version)
      case None => t.snapshot(rel.schema, rel.version)
    }
  }

  // Re-key the replacement plan's output to the V2 relation's attribute
  // ids, so references in parent operators stay valid. None when the
  // spliced plan cannot cover the relation's columns (schema drift
  // between table load and rule run) — the caller keeps the V2 relation,
  // which still reads correctly through the V1Scan fallback.
  private def aligned(df: org.apache.spark.sql.DataFrame,
                      output: Seq[AttributeReference])
      : Option[LogicalPlan] = {
    val inner = df.queryExecution.analyzed
    val byName = inner.output.map(a => a.name -> a).toMap
    if (!output.forall(o => byName.contains(o.name))) None
    else Some(Project(output.map { o =>
      Alias(byName(o.name), o.name)(exprId = o.exprId) }, inner))
  }

  // Conservative catalyst→Column translation for manifest pruning: only
  // shapes PredicateRanges understands; anything else contributes nothing
  // (the Filter on top re-applies the full predicate regardless).
  // quote: a legal column name containing a dot must not parse as
  // struct access when the pruning predicate is re-built as a Column
  private def qcol(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  private def litVal(l: Literal): Option[Column] = l.value match {
    case v: Int => Some(lit(v))
    case v: Long => Some(lit(v))
    case v: Short => Some(lit(v))
    case v: Byte => Some(lit(v))
    case s: UTF8String => Some(lit(s.toString))
    case _ => None
  }

  private def toPredicate(e: Expression): Option[Column] = e match {
    case EqualTo(a: AttributeReference, l: Literal) =>
      litVal(l).map(qcol(a.name) === _)
    case EqualTo(l: Literal, a: AttributeReference) =>
      litVal(l).map(qcol(a.name) === _)
    case GreaterThan(a: AttributeReference, l: Literal) =>
      litVal(l).map(qcol(a.name) > _)
    case GreaterThan(l: Literal, a: AttributeReference) =>
      litVal(l).map(qcol(a.name) < _)
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
      litVal(l).map(qcol(a.name) >= _)
    case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
      litVal(l).map(qcol(a.name) <= _)
    case LessThan(a: AttributeReference, l: Literal) =>
      litVal(l).map(qcol(a.name) < _)
    case LessThan(l: Literal, a: AttributeReference) =>
      litVal(l).map(qcol(a.name) > _)
    case LessThanOrEqual(a: AttributeReference, l: Literal) =>
      litVal(l).map(qcol(a.name) <= _)
    case LessThanOrEqual(l: Literal, a: AttributeReference) =>
      litVal(l).map(qcol(a.name) >= _)
    case In(a: AttributeReference, vs)
        if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      val raw: Seq[Option[Any]] = vs.map {
        case Literal(v: Int, _) => Some(v)
        case Literal(v: Long, _) => Some(v)
        case Literal(v: Short, _) => Some(v)
        case Literal(v: Byte, _) => Some(v)
        case Literal(s: UTF8String, _) => Some(s.toString)
        case _ => None
      }
      if (raw.forall(_.isDefined)) Some(qcol(a.name).isin(raw.flatten: _*))
      else None
    case IsNull(a: AttributeReference) => Some(qcol(a.name).isNull)
    case IsNotNull(a: AttributeReference) => Some(qcol(a.name).isNotNull)
    case Not(IsNull(a: AttributeReference)) => Some(qcol(a.name).isNotNull)
    case And(l, r) =>
      (toPredicate(l), toPredicate(r)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (a, b) => a.orElse(b) // one conjunct still prunes soundly
      }
    case Or(l, r) =>
      for (a <- toPredicate(l); b <- toPredicate(r)) yield a || b
    case _ => None
  }
}
