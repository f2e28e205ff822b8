package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of an additive per-key aggregate from a change
  * feed — the consumption pattern `TxLogTable.changesBetween` exists for: a
  * result table keyed on the group columns absorbs each version's delta as
  *
  *   result ⊕ aggregate(delta)
  *
  * where ⊕ re-aggregates the union per key. Cost per refresh is
  * O(|result| + |delta|) — one keyed shuffle of the maintained rows plus the
  * delta — instead of re-scanning the source table: at 100 TB of events with
  * an hourly append cadence that is the difference between touching the
  * hour's files and touching a year's.
  *
  * Only additive aggregates (sums, counts — and means/variances carried as
  * sum+count pairs) compose this way; non-additive state (distinct sets,
  * exact quantiles) needs sketches or a recompute, which is why the engine's
  * EP3 occupancy rebuild stays a full recompute while its event counts can
  * be maintained incrementally.
  */
object IncrementalAgg {

  /** One refresh step: fold `delta` (raw change-feed rows) into `current`
    * (the maintained aggregate), both keyed by `keys`; `sumCols` are the
    * additive measure columns of `current`. `deltaAgg` maps raw delta rows
    * to the same (keys ++ sumCols) shape — typically a groupBy of the feed.
    */
  def applyDelta(current: DataFrame, delta: DataFrame, keys: Seq[String],
                 sumCols: Seq[String],
                 deltaAgg: DataFrame => DataFrame): DataFrame = {
    require(sumCols.nonEmpty, "applyDelta needs at least one measure column")
    val d = deltaAgg(delta).select((keys ++ sumCols).map(col): _*)
    current.select((keys ++ sumCols).map(col): _*)
      .unionByName(d)
      .groupBy(keys.map(col): _*)
      .agg(sum(sumCols.head).as(sumCols.head),
        sumCols.tail.map(c => sum(c).as(c)): _*)
  }
}
