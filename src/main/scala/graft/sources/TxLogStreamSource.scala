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
  */
final class TxLogStreamSource(ctx: SQLContext, root: String,
                              override val schema: StructType)
    extends Source {

  private def spark = ctx.sparkSession
  private def table: TxLogTable = TxLogTable(spark, root)

  override def getOffset: Option[StreamOffset] =
    table.latestVersion.map(v => LongOffset(v.toLong))

  private def versionOf(o: StreamOffset): Int = o match {
    case LongOffset(v) => v.toInt
    case other => // checkpoint restore hands back a SerializedOffset
      other.json.trim.toInt
  }

  override def getBatch(start: Option[StreamOffset],
                        end: StreamOffset): DataFrame = {
    val fromV = start.map(versionOf).getOrElse(-1)
    val delta = table.changesBetween(schema, fromV, versionOf(end))
      .drop("_commit_version")
    org.apache.spark.sql.graft.StreamingShim.asStreaming(spark, delta)
  }

  override def stop(): Unit = ()
}
