package graft.catalyst

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Restores parquet row-group pruning for range predicates on the engine's
  * DERIVED epoch-nanos column.
  *
  * `Tables.epochNanos` normalizes `events.ts` to epoch-nanos LongType by
  * projecting `unix_micros(cast(ts as timestamp)) * 1000` above the scan
  * (source-boundary contract — see Tables.scala). Catalyst's
  * PushPredicateThroughProject happily substitutes the alias, so a filter
  * `ts >= X` lands above the relation as
  * `multiply(unix_micros(cast(ts)), 1000) >= X` — which no datasource can
  * translate: the casual `spark.read.parquet` path loses its
  * `PushedFilters` entirely and every row group is read.
  *
  * This rule ANDs a REDUNDANT, WEAKER-OR-EQUAL bound on the raw timestamp
  * attribute next to each such comparison: `ts >= timestamp(floorDiv(X,
  * 1000))` for lower bounds, the mirror for upper bounds, both for
  * equality. Redundant-conjunct form keeps exactness trivially (the
  * original predicate still row-filters; the added bound can only be
  * looser), while the new conjunct is a plain attribute-vs-literal
  * comparison every source translates — parquet min/max row-group stats
  * prune again. At 100 TB this is the difference between "read 3 days"
  * and "read 3 years" for a time-range query on the casual read path (the
  * txlog manifest paths never lost this — their stats live on the derived
  * longs).
  *
  * Soundness guards:
  *  - fires only under `spark.sql.session.timeZone=UTC` (engine-wide
  *    contract, pinned at every entry point): the NTZ→LTZ cast is then
  *    micros-identity, so the literal micros compare against the raw
  *    column's internal micros exactly;
  *  - injected as a PRE-CBO rule (runs once, after the operator-
  *    optimization fixpoint): conjuncts are never re-added, and the
  *    semantic-dedup check below makes re-entry a no-op anyway.
  */
case class EpochNanosPushdown(spark: SparkSession)
    extends Rule[LogicalPlan] {

  // the derived-nanos shape: multiply(unix_micros(<ts attr>), 1000) with
  // the cast either present (NTZ source) or folded away (LTZ source)
  private object DerivedNanos {
    def unapply(e: Expression): Option[Attribute] = e match {
      case Multiply(UnixMicros(Cast(a: Attribute, TimestampType, _, _)),
          Literal(1000L, LongType), _)
          if a.dataType == TimestampNTZType ||
            a.dataType == TimestampType => Some(a)
      case Multiply(UnixMicros(a: Attribute), Literal(1000L, LongType), _)
          if a.dataType == TimestampType => Some(a)
      case _ => None
    }
  }

  private def tsLit(a: Attribute, micros: Long): Literal =
    Literal(micros, a.dataType) // both timestamp types store raw micros

  private def lower(a: Attribute, nanos: Long): Expression =
    GreaterThanOrEqual(a, tsLit(a, Math.floorDiv(nanos, 1000L)))

  private def upper(a: Attribute, nanos: Long): Expression =
    LessThanOrEqual(a, tsLit(a, Math.floorDiv(nanos, 1000L)))

  // weaker-or-equal pushable twin of one conjunct (None = not our shape)
  private def bound(e: Expression): Option[Expression] = e match {
    case GreaterThanOrEqual(DerivedNanos(a), Literal(x: Long, LongType)) =>
      Some(lower(a, x))
    case GreaterThan(DerivedNanos(a), Literal(x: Long, LongType)) =>
      Some(lower(a, x))
    case LessThanOrEqual(DerivedNanos(a), Literal(x: Long, LongType)) =>
      Some(upper(a, x))
    case LessThan(DerivedNanos(a), Literal(x: Long, LongType)) =>
      Some(upper(a, x))
    case EqualTo(DerivedNanos(a), Literal(x: Long, LongType)) =>
      Some(And(lower(a, x), upper(a, x)))
    // literal-first mirrors
    case GreaterThanOrEqual(Literal(x: Long, LongType), DerivedNanos(a)) =>
      Some(upper(a, x))
    case GreaterThan(Literal(x: Long, LongType), DerivedNanos(a)) =>
      Some(upper(a, x))
    case LessThanOrEqual(Literal(x: Long, LongType), DerivedNanos(a)) =>
      Some(lower(a, x))
    case LessThan(Literal(x: Long, LongType), DerivedNanos(a)) =>
      Some(lower(a, x))
    case EqualTo(Literal(x: Long, LongType), DerivedNanos(a)) =>
      Some(And(lower(a, x), upper(a, x)))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.sessionLocalTimeZone != "UTC") return plan
    plan.transform {
      case f @ Filter(cond, child) =>
        val parts = splitConjuncts(cond)
        val extras = parts.flatMap(bound)
          .filterNot(b => parts.exists(_.semanticEquals(b)))
        if (extras.isEmpty) f
        else Filter((parts ++ extras).reduce(And), child)
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
