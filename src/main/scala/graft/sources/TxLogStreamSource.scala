package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => StreamOffset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType

/** `spark.readStream.format("txlog").load(root)` — the tx-log change feed
  * as a Structured Streaming source. Offsets ARE version numbers: each
  * micro-batch is `changesBetween(startV, endV]` — exactly the delta
  * files of those versions, never a rescan. Replay for exactly-once
  * recovery is free because data files are immutable and the manifest is
  * append-only: `getBatch(start, end)` is deterministic for any
  * checkpointed offset pair, as long as `vacuum` retention exceeds the
  * maximum recovery window (the same contract every CDC log source has).
  *
  * Append-only feed: overwrite commits surface their full new file set
  * (a reset, as on [[TxLogTable.changesBetween]]); MOR delete versions
  * contribute no rows here — streaming consumers that need deletes read
  * [[TxLogTable.changesWithDeletes]] batch-incrementally instead.
  *
  * The batch delta is re-flagged `isStreaming` via the classic session's
  * `internalCreateDataFrame` — the V1 `Source` contract (the rows are the
  * already-planned delta; only the flag changes).
  *
  * `option("maxVersionsPerTrigger", n)` bounds CATCH-UP batches: a stream
  * resumed against a table that committed 10,000 versions while it was
  * down drains them n versions at a time instead of planning one
  * mega-batch over the whole backlog (the `maxFilesPerTrigger` discipline
  * — at 100 TB an unbounded recovery batch is a driver-planning and
  * shuffle-spill hazard). Steady state is unaffected: once caught up,
  * each trigger still reads exactly the newly committed versions.
  *
  * Maintenance commits are SKIPPED by default: `compact` / `zorder` /
  * `rebucket` / `optimize` rewrite every (or most) file of the table
  * without changing a row, and a feed that diffed file sets blindly would
  * replay the whole table as inserts into every consumer — at 100 TB, one
  * `CALL system.rebucket` on a streamed table is a full-table phantom
  * re-delivery. The `#op=` manifest line identifies them
  * ([[TxLogTable.RewriteOps]]); versions carrying those ops emit zero
  * rows. `option("includeMaintenance", "true")` opts back into the raw
  * file feed for consumers that genuinely track physical files (mirrors
  * the public Delta CDF's `dataChange = false` / `skipChangeCommits`
  * handling).
  */
final class TxLogStreamSource(ctx: SQLContext, root: String,
                              override val schema: StructType,
                              maxVersionsPerTrigger: Option[Int] = None,
                              includeMaintenance: Boolean = false)
    extends Source {

  private def spark = ctx.sparkSession
  private def table: TxLogTable = TxLogTable(spark, root)

  // Highest version already OFFERED to the engine (advanced in getOffset,
  // re-synced from the checkpoint via getBatch on recovery). The cap is
  // offered-relative: micro-batch execution commits each offered range
  // before asking for the next offset, so offered == committed between
  // triggers.
  @volatile private var offeredV: Int = -1

  override def getOffset: Option[StreamOffset] =
    table.latestVersion.map { v =>
      val end = maxVersionsPerTrigger match {
        case Some(m) if offeredV >= 0 => math.min(v, offeredV + m)
        // first trigger of a fresh stream: the initial snapshot is ONE
        // consistent batch (capping it would expose a torn first read)
        case _ => v
      }
      offeredV = math.max(offeredV, end)
      LongOffset(end.toLong)
    }

  private def versionOf(o: StreamOffset): Int = o match {
    case LongOffset(v) => v.toInt
    case other => // checkpoint restore hands back a SerializedOffset
      other.json.trim.toInt
  }

  override def getBatch(start: Option[StreamOffset],
                        end: StreamOffset): DataFrame = {
    val fromV = start.map(versionOf).getOrElse(-1)
    val endV = versionOf(end)
    // recovery re-sync: a restarted query replays its checkpointed range
    // first; subsequent getOffset caps must extend from THAT committed
    // end, not from -1
    offeredV = math.max(offeredV, endV)
    val delta = table
      .changesBetween(schema, fromV, endV,
        skipRewrites = !includeMaintenance)
      .drop("_commit_version")
    org.apache.spark.sql.graft.StreamingShim.asStreaming(spark, delta)
  }

  override def stop(): Unit = ()
}
