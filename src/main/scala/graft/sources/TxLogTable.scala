package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Minimal transaction-log table format — the commit protocol behind the
  * public Delta/Iceberg designs, re-derived for this engine's sink layer
  * (S4): a table is a pile of immutable data files plus an append-only log
  * of version manifests; a version BECOMES VISIBLE in the single atomic
  * create of its manifest file.
  *
  * Why this beats the staging-directory swap of `EtlContext.replace` at
  * 100 TB:
  *  - readers resolve a manifest once and read exactly that file list —
  *    snapshot isolation with no rename window, on stores where directory
  *    rename is not atomic (object stores);
  *  - a writer crash after staging data but before publishing the manifest
  *    leaves only unreferenced files — the table is untouched;
  *  - appends are O(delta): new files are added to the manifest, nothing is
  *    rewritten;
  *  - old versions stay readable (time travel) until vacuumed.
  *
  * Concurrency is optimistic: the manifest is claimed with an atomic
  * create-if-absent (`CREATE_NEW`); a losing writer re-reads the latest
  * version and retries its commit. On a real deployment the `CREATE_NEW`
  * primitive maps to HDFS create-no-overwrite / object-store
  * put-if-absent.
  */
final case class TxLogTable(spark: SparkSession, root: String) {

  private val logDir: Path = Paths.get(root, "_log")
  private val dataDir: Path = Paths.get(root, "data")

  private def manifestPath(v: Int): Path = logDir.resolve(f"v$v%08d.manifest")

  /** Committed versions, ascending; empty for a nonexistent table. */
  def versions: Seq[Int] =
    if (!Files.isDirectory(logDir)) Nil
    else scala.util.Using.resource(Files.list(logDir)) { s =>
      s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
          n.stripPrefix("v").stripSuffix(".manifest").toInt }
        .toSeq.sorted
    }

  def latestVersion: Option[Int] = versions.lastOption

  private def readManifest(v: Int): Seq[String] =
    new String(Files.readAllBytes(manifestPath(v)), UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty)

  /** Snapshot read of `version` (default: latest). Absent table or empty
    * manifest → empty DataFrame with the given schema (DDL bootstrap, S5).
    */
  def snapshot(schema: StructType, version: Option[Int] = None): DataFrame = {
    val v = version.orElse(latestVersion)
    val files = v.map(readManifest).getOrElse(Nil)
      .map(rel => dataDir.resolve(rel).toString)
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      // basePath makes Spark parse hive `k=v` segments between dataDir and
      // each listed leaf file, restoring partition columns committed with
      // `partitionCols`; batch-<uuid> segments are not k=v and are ignored.
      spark.read.option("basePath", dataDir.toString)
        .schema(schema).parquet(files: _*)
  }

  /** Commit `df` as the next version. `overwrite = false` appends: the new
    * manifest carries the previous version's files plus the delta. Returns
    * the committed version number.
    */
  def commit(df: DataFrame, overwrite: Boolean,
             maxAttempts: Int = 10,
             partitionCols: Seq[String] = Nil): Int = {
    Files.createDirectories(dataDir)
    Files.createDirectories(logDir)
    // stage immutable data files under a unique batch dir — invisible until
    // a manifest references them. `partitionCols` lays the batch out
    // hive-style under the batch dir (`batch-x/k=v/part-*.parquet`); the
    // manifest records the partition-qualified relative paths, and
    // `snapshot` pins `basePath` so readers recover the partition columns —
    // partition pruning on the txLog backend matches the dirswap backend.
    val batch = "batch-" + java.util.UUID.randomUUID().toString
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(dataDir.resolve(batch).toString)
    val staged = scala.util.Using.resource(
        Files.walk(dataDir.resolve(batch))) { s =>
      s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") &&
          Files.isRegularFile(p))
        .map(p => dataDir.relativize(p).toString)
        .toSeq.sorted
    }
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = latestVersion
      val carried =
        if (overwrite) Nil else base.map(readManifest).getOrElse(Nil)
      val next = base.getOrElse(-1) + 1
      try {
        // the atomic publish: create-if-absent of the version manifest
        Files.write(manifestPath(next),
          (carried ++ staged).mkString("\n").getBytes(UTF_8),
          StandardOpenOption.CREATE_NEW)
        return next
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          attempt += 1 // lost the race — re-resolve latest and retry
      }
    }
    throw new IllegalStateException(
      s"commit lost the version race $maxAttempts times: $root")
  }
}
