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
                            partitionCols: Seq[String],
                            fenceId: Option[String] = None,
                            mergeSchema: Boolean = false) extends Sink {

  private def table: TxLogTable = TxLogTable(ctx.sparkSession, root)

  /** Per-query identity for the replay fence. Fencing on batchId alone is
    * unsound twice over: two different streaming queries appending to the
    * same table collide on batch ids (query B's batch 7 looks like a
    * replay of query A's batch 7), and restarting a query from a FRESH
    * checkpoint resets batchId to 0 — either way a legitimate new batch
    * would be silently dropped as a "replay". So the tag carries
    * (queryId, batchId) like Delta's txn-app-id fencing: explicit
    * `option("fenceId", ...)` wins (lets a user keep one identity across
    * checkpoint resets when they KNOW the data lineage is the same),
    * otherwise the runId-stable streaming queryId Spark publishes as a
    * local property on the stream execution thread.
    */
  private def queryIdentity: String =
    fenceId.orElse(Option(ctx.sparkSession.sparkContext.getLocalProperty(
      org.apache.spark.sql.execution.streaming.runtime
        .StreamExecution.QUERY_ID_KEY)))
      .getOrElse("no-query-id")

  /** How far back the replay fence looks. A replayed epoch re-runs
    * immediately after recovery, so only commits landed between the
    * original epoch's publish and the restart — other writers' commits in
    * a crash window — can sit between the tag and the head. Bounding the
    * scan keeps `addBatch` O(window) instead of O(all versions) on a
    * long-running stream (thousands of micro-batch commits would
    * otherwise make every fence check re-read the whole manifest log).
    */
  private val FenceWindow = 100

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val t = table
    val opTag = s"stream-append:$queryIdentity:$batchId"
    // fence replayed epochs by the op tag in recent commit history (valid
    // while vacuum retention exceeds the recovery window, as for the
    // source, and while fewer than FenceWindow foreign commits land
    // inside a single crash-recovery window): one manifest read per
    // recent version, never the whole log
    if (t.versions.takeRight(FenceWindow)
        .exists(v => t.opOf(v).contains(opTag)))
      return
    // Sink.addBatch hands a streaming-flagged micro-batch that a batch
    // writer refuses — re-wrap its InternalRow RDD (rows stay
    // executor-side; the standard V1 sink pattern).
    val batchDf = org.apache.spark.sql.graft.StreamingShim
      .asBatch(ctx.sparkSession, data)
    // opt-in drift absorption: a stream whose upstream grows/widens
    // columns evolves the target instead of dying mid-ingest (idempotent
    // across epoch replays — an already-aligned schema is a no-op)
    if (mergeSchema) t.evolveSchemaFor(batchDf.schema)
    // layout: explicit partitionBy wins; otherwise INHERIT the target
    // table's current layout — appends must match it anyway (the commit
    // require), and a bucketed table's hidden `_bkt` level is not a
    // column the user could name in partitionBy at all (the staging
    // chokepoint derives it)
    val layout =
      if (partitionCols.nonEmpty) partitionCols
      else table.latestVersion.map(table.partitionColsOf).getOrElse(Nil)
    t.commit(batchDf, overwrite = false, partitionCols = layout,
      op = opTag)
  }
}
