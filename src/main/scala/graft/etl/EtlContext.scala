package graft.etl

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.StructType

/** Warehouse context: parquet table paths + the pinned run timestamp.
  *
  * The reference commits row-at-a-time into Postgres; our tables are immutable
  * parquet directories rewritten atomically per run (merge-by-rewrite, SURVEY
  * §2.4). Because a rewrite both reads and replaces the same table, writes go
  * to a staging dir that is swapped in only after the write succeeds — the
  * moral equivalent of the reference's transaction, and the reason a failed
  * occupancy rebuild can no longer leave a truncated table behind
  * (`/root/reference/iis_etl/logic.py:449,474-476`).
  *
  * One `runTs` is captured per run and used for every SCD2 close/open in that
  * run (deterministic reruns; documented deviation from the reference's
  * per-statement `now()`, SURVEY §7).
  */
final case class EtlContext(spark: SparkSession, warehouse: String,
                            runTs: java.sql.Timestamp,
                            txLog: Boolean = false) {

  val runTsCol: Column = lit(runTs)

  private def path(table: String): Path = Paths.get(warehouse, table)

  private def tx(table: String): graft.sources.TxLogTable =
    graft.sources.TxLogTable(spark, path(table).toString)

  def exists(table: String): Boolean =
    if (txLog) tx(table).latestVersion.isDefined
    else Files.exists(path(table))

  /** Read a table; absent table → empty DataFrame with the declared schema
    * (DDL-bootstrap semantics: create-if-absent, reference main.py:26-29).
    */
  def read(table: String, schema: StructType): DataFrame =
    if (txLog) tx(table).snapshot(schema)
    else if (exists(table))
      spark.read.schema(schema).parquet(path(table).toString)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Atomic table replace. Default backend: write to staging, then swap
    * directories — `partitionCols` lays the table out hive-style (SURVEY
    * §4: events partitioned by entity_type match every delete/filter
    * predicate — at scale that is partition pruning plus dynamic-partition-
    * overwrite-shaped slice replacement). With `txLog = true` the replace
    * is a transaction-log overwrite commit instead — safe on stores whose
    * directory rename is not atomic; `partitionCols` is threaded into the
    * commit, so the batch keeps its hive layout and snapshot reads recover
    * the partition columns via basePath (TxLogTable scaladoc).
    */
  def replace(table: String, df: DataFrame,
              partitionCols: Seq[String] = Nil): Unit =
    if (txLog) {
      tx(table).commit(df, overwrite = true, partitionCols = partitionCols)
      ()
    }
    else {
      val tmp = Paths.get(warehouse, s"_staging_$table")
      val w = df.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(tmp.toString)
      deleteRecursive(path(table))
      Files.move(tmp, path(table))
    }

  /** Table maintenance (tx-log backend only) — the operational surface of
    * the underlying [[graft.sources.TxLogTable]]: incremental change feed,
    * small-file compaction, history GC, and the version cursor feeds are
    * driven from.
    */
  def latestVersion(table: String): Option[Int] = {
    require(txLog, s"latestVersion($table) requires the txLog backend")
    tx(table).latestVersion
  }

  def changesBetween(table: String, schema: StructType,
                     fromV: Int, toV: Int): DataFrame = {
    require(txLog, s"changesBetween($table) requires the txLog backend")
    tx(table).changesBetween(schema, fromV, toV)
  }

  def compact(table: String, schema: StructType, numFiles: Int = 1): Int = {
    require(txLog, s"compact($table) requires the txLog backend")
    tx(table).compact(schema, numFiles)
  }

  def vacuum(table: String, keep: Int = 1,
             minAgeMillis: Long =
               graft.sources.TxLogTable.DefaultVacuumMinAgeMillis,
             retainMillis: Long =
               graft.sources.TxLogTable.DefaultVacuumRetainMillis,
             dryRun: Boolean = false)
      : (Int, Int) = {
    require(txLog, s"vacuum($table) requires the txLog backend")
    tx(table).vacuum(keep, minAgeMillis, retainMillis, dryRun)
  }

  def history(table: String): Seq[graft.sources.TxLogTable.VersionInfo] = {
    require(txLog, s"history($table) requires the txLog backend")
    tx(table).history()
  }

  def compactZOrder(table: String, schema: StructType,
                    colA: String, colB: String, numFiles: Int = 8): Int = {
    require(txLog, s"compactZOrder($table) requires the txLog backend")
    tx(table).compactZOrder(schema, colA, colB, numFiles)
  }

  /** Keyed copy-on-write MERGE (file-targeted upsert) on a tx-log table. */
  def merge(table: String, schema: StructType, incoming: DataFrame,
            keys: Seq[String]): graft.sources.TxLogTable.MergeStats = {
    require(txLog, s"merge($table) requires the txLog backend")
    tx(table).merge(schema, incoming, keys)
  }

  /** Copy-on-write DELETE WHERE (file-targeted) on a tx-log table. */
  def deleteWhere(table: String, schema: StructType,
                  pred: org.apache.spark.sql.Column)
      : graft.sources.TxLogTable.MergeStats = {
    require(txLog, s"deleteWhere($table) requires the txLog backend")
    tx(table).deleteWhere(schema, pred)
  }

  /** Merge-on-read equality DELETE (tombstones) on a tx-log table. */
  def deleteByKeysMor(table: String, deleteKeys: DataFrame): Int = {
    require(txLog, s"deleteByKeysMor($table) requires the txLog backend")
    tx(table).deleteByKeysMor(deleteKeys)
  }

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p))
      scala.util.Using.resource(Files.walk(p)) { s =>
        s.sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.delete(f))
      }
}
