package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.PartitionedFileUtil
import org.apache.spark.sql.execution.datasources.{FilePartition, InMemoryFileIndex}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Storage-partitioned-join scan for a HIVE-PARTITIONED txlog table: the
  * scan reports [[KeyGroupedPartitioning]] over the table's partition
  * columns and emits input partitions that each carry their partition
  * key ([[HasPartitionKey]]), so Spark's storage-partitioned join
  * (SPARK-37377, `spark.sql.sources.v2.bucketing.enabled`) can co-locate
  * a join of two tables partitioned on the same key with ZERO shuffle
  * exchanges — at 100 TB the join simply never moves either fact table.
  * An aggregation keyed on the partition columns equally skips its final
  * shuffle ([[KeyGroupedPartitioning]] satisfies the clustered
  * distribution).
  *
  * The physical read is Spark's own vectorized [[ParquetScanBuilder]]
  * machinery over the MANIFEST-PRUNED file subset — same pruning
  * contract as every other read path: the conservatively translated
  * pushed-filter conjunction selects candidate files
  * (`candidateFilesWhere`: range stats, nulls, partition segments,
  * Blooms), every filter stays residual so Spark re-applies it row-level,
  * and the same filters are additionally handed to the parquet builder
  * for row-group pruning (sound for a plain snapshot read — unlike the
  * row-level-DML group scan, no carried rows must survive here).
  *
  * Eligibility is gated by [[TxLogV2Table.spjEligible]]: partitioned,
  * no live MOR tombstones, no column mapping, and the bucketing conf on
  * (the read-rule splice to the native V1 parquet plan — which cannot
  * report partitioning — is skipped under exactly the same condition, so
  * the two paths never fight).
  *
  * One keyed input partition per ~maxSplitBytes task per partition
  * directory: Spark groups same-key partitions back together at plan
  * time, and with partially-clustered distribution enabled it can keep
  * skewed keys split — the scan does not pre-bake one giant task per
  * partition value.
  */
final class TxLogSpjScan(spark: SparkSession, tbl: TxLogV2Table,
                         required: StructType, filters: Array[Filter])
    extends Scan with Batch with SupportsReportPartitioning {

  private val version = tbl.asOfVersion

  // manifest pruning: partial translation is sound (files only; rows
  // re-filtered by the residual Filter Spark keeps above the scan)
  private val rels: Seq[String] = {
    val pred = filters.toSeq.flatMap(TxLogV2Table.loosePredicate)
      .reduceOption(_ && _)
    pred match {
      case Some(p) => tbl.table.candidateFilesWhere(p, version)
      case None => tbl.table.entries(version).map(_.rel)
    }
  }

  private val dataDir = java.nio.file.Paths.get(tbl.root, "data").toString

  // basePath discovery re-types the `k=v` hive segments of the pruned
  // leaves against the declared schema — one partition directory per
  // distinct partition value among the surviving files
  private lazy val index = new InMemoryFileIndex(spark,
    rels.sorted.map(r => new org.apache.hadoop.fs.Path(s"$dataDir/$r")),
    Map("basePath" -> dataDir), Some(tbl.schema))

  private lazy val inner = {
    val b = ParquetScanBuilder(spark, index, tbl.schema, tbl.schema,
      CaseInsensitiveStringMap.empty())
    b.pruneColumns(required)
    b.pushDataFilters(filters) // row-group pruning only; rows re-filtered
    b.build()
  }

  private lazy val dirs = index.listFiles(Nil, Nil)

  override def readSchema(): StructType = inner.readSchema()

  override def toBatch: Batch = this

  /** Identity layout → identity transforms over the partition columns;
    * bucketed layout → ONE `bucket(n, key)` transform (the hidden `_bkt`
    * dir values ARE the bucket ids). Spark resolves the bucket transform
    * through the catalog's [[TxLogBucketFunction]], so two bucketed
    * txlog scans key-group compatibly and the join plans shuffle-free.
    */
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      tbl.bucketSpec match {
        case Some((k, n)) =>
          Array(Expressions.bucket(n, k)
            : org.apache.spark.sql.connector.expressions.Expression)
        case None =>
          index.partitionSchema.fields.map(f =>
            Expressions.identity(f.name)
              : org.apache.spark.sql.connector.expressions.Expression)
      },
      dirs.size)

  override def planInputPartitions(): Array[InputPartition] = {
    val maxSplit = FilePartition.maxSplitBytes(spark, dirs)
    dirs.iterator.flatMap { d =>
      val splits = d.files.flatMap(f => PartitionedFileUtil.splitFiles(
        f, f.getPath, isSplitable = true, maxSplit, d.values))
      FilePartition.getFilePartitions(spark, splits, maxSplit)
        .map(fp => TxLogKeyedPartition(fp, d.values))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TxLogKeyedReaderFactory(inner.createReaderFactory())

  override def description(): String =
    s"TxLogSpjScan ${tbl.ident} [${index.partitionSchema.fieldNames
      .mkString(", ")}] files=${rels.size} groups=${dirs.size}"
}

/** A parquet task bundle plus the partition key it belongs to — what
  * Spark's plan-time partition grouping keys on. Delegation (not
  * subclassing `FilePartition`) keeps the wrapper a plain case class;
  * the reader factory unwraps before handing to the parquet reader.
  */
final case class TxLogKeyedPartition(fp: FilePartition, key: InternalRow)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = key
  override def preferredLocations(): Array[String] = fp.preferredLocations()
}

/** Unwraps [[TxLogKeyedPartition]] back to the [[FilePartition]] the
  * delegate parquet reader factory asserts on.
  */
final class TxLogKeyedReaderFactory(inner: PartitionReaderFactory)
    extends PartitionReaderFactory {
  private def unwrap(p: InputPartition): InputPartition = p match {
    case TxLogKeyedPartition(fp, _) => fp
    case other => other
  }
  override def createReader(p: InputPartition) =
    inner.createReader(unwrap(p))
  override def createColumnarReader(p: InputPartition) =
    inner.createColumnarReader(unwrap(p))
  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(unwrap(p))
}
