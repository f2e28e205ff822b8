package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink

/** `writeStream.format("txlog")` — exactly-once streaming APPEND sink for
  * the tx-log format. Exactly-once falls out of the commit protocol plus
  * batch-id fencing: each micro-batch commits as one atomic manifest
  * publish carrying `#streamBatch=<id>`, and a replayed `addBatch` (the
  * epoch Spark re-runs after a crash between sink commit and checkpoint
  * write) is detected by scanning the manifest history for the id and
  * skipped — the same transactional-sink contract Delta's streaming
  * writer implements. Batches are appends; route upserts through
  * `foreachBatch` + `TxLogTable.merge` (see `StreamOps.upsertIntoTxLog`).
  */
final class TxLogStreamSink(ctx: SQLContext, root: String,
                            partitionCols: Seq[String]) extends Sink {

  private def table: TxLogTable = TxLogTable(ctx.sparkSession, root)

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val t = table
    val opTag = s"stream-append:$batchId"
    // fence replayed epochs by the op tag in commit history (valid while
    // vacuum retention exceeds the recovery window, as for the source)
    if (t.history().exists(_.op.contains(opTag))) return
    // Sink.addBatch hands a streaming-flagged micro-batch that a batch
    // writer refuses — re-wrap its InternalRow RDD (rows stay
    // executor-side; the standard V1 sink pattern).
    val batchDf = org.apache.spark.sql.graft.StreamingShim
      .asBatch(ctx.sparkSession, data)
    t.commit(batchDf, overwrite = false, partitionCols = partitionCols,
      op = opTag)
  }
}
