package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** V1 streaming `Source.getBatch` must return a DataFrame whose logical
  * plan is flagged `isStreaming` — the only constructor is the classic
  * session's `internalCreateDataFrame(..., isStreaming = true)`, which is
  * `private[sql]` at the Scala level; hence this one-liner in the
  * established extension namespace (same pattern as [[PredicateRanges]]'s
  * ColumnNode access). The rows are the already-planned batch delta; only
  * the flag changes.
  */
object StreamingShim {
  def asStreaming(spark: SparkSession, df: DataFrame): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(
        df.queryExecution.toRdd, df.schema, isStreaming = true)

  /** The inverse, for V1 `Sink.addBatch`: the handed micro-batch carries a
    * streaming-flagged plan that batch writers refuse (`.rdd` throws); re-
    * wrapping its InternalRow RDD un-flags it without moving any data.
    */
  def asBatch(spark: SparkSession, df: DataFrame): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(
        df.queryExecution.toRdd, df.schema, isStreaming = false)
}
