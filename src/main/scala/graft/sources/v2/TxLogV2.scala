package graft.sources.v2

import java.nio.file.{Files, Path, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{TxLogRelation, TxLogTable}

/** DataSource V2 catalog for the tx-log format — the SQL DDL surface:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.tx", "graft.sources.v2.TxLogCatalog")
  *   spark.conf.set("spark.sql.catalog.tx.warehouse", "/path/wh")
  *   spark.sql("CREATE TABLE tx.ns.t (id BIGINT, v STRING) USING txlog")
  *   spark.sql("INSERT INTO tx.ns.t VALUES (1, 'a')")
  *   spark.sql("SELECT * FROM tx.ns.t")
  *   spark.sql("ALTER TABLE tx.ns.t RENAME COLUMN v TO val")
  * }}}
  *
  * Tables live at `<warehouse>/<namespace...>/<name>`; the catalog is a
  * thin identifier→path router over [[TxLogTable]], which owns the commit
  * protocol. ALTER TABLE RENAME/DROP COLUMN route to the column-mapping
  * metadata commits ([[TxLogTable.renameColumn]]/[[TxLogTable.dropColumn]])
  * — pure manifest operations, no data rewrite.
  *
  * Read path: [[TxLogV2Table.newScanBuilder]] provides a [[V1Scan]]
  * fallback so any session can query catalog tables, but a session built
  * with `spark.sql.extensions=graft.GraftExtensions` replaces the V2
  * relation with the native parquet plan ([[TxLogReadRule]]) — full
  * vectorized scan + whole-stage codegen + manifest pruning, no
  * InternalRow→Row conversion (the round-5 connector tax, gone).
  */
class TxLogCatalog extends TableCatalog with ProcedureCatalog
    with FunctionCatalog {

  /** Column DEFAULT values, end to end: declaring this capability makes
    * the analyzer (a) rewrite `CREATE TABLE ... DEFAULT expr` /
    * `ALTER TABLE ADD COLUMN ... DEFAULT expr` into the standard
    * field-metadata keys before they reach this catalog, and (b) fill
    * omitted columns in INSERTs from CURRENT_DEFAULT. The metadata
    * persists through `#schema=` JSON like any schema fact; files
    * predating an added-with-default column fill EXISTS_DEFAULT at read
    * (Spark's parquet readers honor it from the requested schema), so
    * the ALTER stays metadata-only even with a non-NULL backfill
    * semantic — the 100 TB alternative is rewriting every file.
    */
  override def capabilities()
      : util.Set[org.apache.spark.sql.connector.catalog
        .TableCatalogCapability] =
    util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  /** The catalog's one V2 function: `bucket` — what Spark's
    * storage-partitioned-join planner resolves a reported
    * `bucket(n, key)` transform against (V2ExpressionUtils loads
    * `bucket` from the table's FunctionCatalog and binds it). Both join
    * sides resolve THIS function, so their `canonicalName`s match and
    * the key-grouped partitions are compatible; with the V2 bucketed
    * shuffle conf on, Spark can also evaluate it to shuffle a
    * NON-bucketed side into alignment (produceResult below is exactly
    * the write path's hash).
    */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty)
      Array(Identifier.of(Array.empty[String], "bucket"))
    else Array.empty

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction = {
    if (!(ident.namespace.isEmpty && ident.name == "bucket"))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident)
    TxLogBucketFunction
  }

  private var catalogName: String = _
  private var warehouse: Path = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val wh = options.get("warehouse")
    require(wh != null && wh.nonEmpty,
      s"catalog $name needs spark.sql.catalog.$name.warehouse")
    warehouse = Paths.get(wh)
  }

  override def name(): String = catalogName

  private def pathOf(ident: Identifier): Path =
    ident.namespace.foldLeft(warehouse)(_.resolve(_)).resolve(ident.name)

  private def spark: SparkSession = SparkSession.active

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = namespace.foldLeft(warehouse)(_.resolve(_))
    if (!Files.isDirectory(dir)) Array.empty
    else scala.util.Using.resource(Files.list(dir)) { s =>
      s.iterator().asScala
        .filter(p => Files.isDirectory(p.resolve("_log")))
        .map(p => Identifier.of(namespace, p.getFileName.toString))
        .toArray
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    Files.isDirectory(pathOf(ident).resolve("_log")) &&
      TxLogTable(spark, pathOf(ident).toString).latestVersion.isDefined

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) {
      return branchTableFor(ident).orElse(metaTableFor(ident)).getOrElse(
        throw new NoSuchTableException(ident))
    }
    TxLogV2Table(spark, pathOf(ident).toString, ident.toString)
  }

  /** Branch identifiers: `cat.db.t.branch_<name>` resolves to branch
    * `<name>` of table `db.t` (the Iceberg `t.branch_audit` surface) —
    * a full read/write relation, so `INSERT INTO t.branch_x`,
    * `UPDATE/DELETE/MERGE` on it, and audit SELECTs all run against the
    * branch log while main stays untouched until `CALL system.publish`.
    */
  private def branchTableFor(ident: Identifier): Option[Table] = {
    if (ident.namespace().length < 1 ||
      !ident.name.startsWith("branch_")) return None
    val parent = Identifier.of(ident.namespace.init, ident.namespace.last)
    if (!tableExists(parent)) return None
    val name = ident.name.stripPrefix("branch_")
    val t = TxLogTable(spark, pathOf(parent).toString)
    if (!t.branches().contains(name)) return None
    Some(TxLogV2Table(spark,
      TxLogTable.branchRoot(pathOf(parent).toString, name),
      ident.toString))
  }

  /** Iceberg-style SELECT-able METADATA TABLES: `cat.db.t.files`,
    * `cat.db.t.history`, `cat.db.t.partitions` resolve as relations —
    * the identifier's namespace tail names the data table, its name the
    * metadata view. Unlike the `CALL system.history/partitions` procs
    * (one-shot summaries), these compose: join `t.files` against a
    * debt threshold, filter `t.history` by op, aggregate `t.partitions`
    * — plain SQL over the manifest. Rows come from the manifest the
    * driver already holds (O(files) strings — the same driver-side data
    * every commit plans against, never the table's rows), served
    * through a LocalScan like the proc results.
    */
  private def metaTableFor(ident: Identifier,
                           asOf: Option[Int] = None): Option[Table] = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField}
    import org.apache.spark.unsafe.types.UTF8String
    if (ident.namespace().length < 1) return None
    val parent = Identifier.of(ident.namespace.init, ident.namespace.last)
    if (!tableExists(parent)) return None
    def t = TxLogTable(spark, pathOf(parent).toString)
    asOf.foreach(v => require(
      TxLogTable(spark, pathOf(parent).toString).versions.contains(v),
      s"version $v of ${parent.toString} does not exist (or was vacuumed)"))
    def utf(s: String) = UTF8String.fromString(s)
    def partOf(rel: String): String = {
      val i = rel.lastIndexOf('/')
      if (i < 0) "" else rel.substring(0, i)
    }
    val fields: Option[(StructType, () => Seq[InternalRow])] =
      ident.name match {
        case "history" => Some((StructType(Seq(
            StructField("version", IntegerType),
            StructField("commit_millis", LongType),
            StructField("op", StringType),
            StructField("num_files", IntegerType))),
          () => t.history()
            .filter(h => asOf.forall(h.version <= _))
            .map(h => InternalRow(h.version,
            h.commitMillis.map(Long.box).orNull, utf(h.op.getOrElse("")),
            h.numFiles))))
        case "files" => Some((StructType(Seq(
            StructField("file", StringType),
            StructField("partition", StringType),
            StructField("rows", LongType),
            StructField("bytes", LongType),
            StructField("dv_masked", LongType))),
          () => {
            val tbl = t
            val v = asOf.orElse(tbl.latestVersion)
            val sizes = tbl.fileSizes(v).toMap
            val masked = v.map(tbl.dvsOf).getOrElse(Nil)
              .groupBy(_.file).view.mapValues(_.map(_.n).sum).toMap
            tbl.entries(v).map { e =>
              InternalRow(utf(e.rel), utf(partOf(e.rel)),
                e.stats.get(TxLogTable.RowsKey).map(r => Long.box(r._1))
                  .orNull,
                sizes.getOrElse(e.rel, 0L),
                masked.getOrElse(e.rel, 0L))
            }
          }))
        case "tags" => Some((StructType(Seq(
            StructField("name", StringType),
            StructField("version", IntegerType))),
          () => t.tags().toSeq.sortBy(_._1).map { case (n, v) =>
            InternalRow(utf(n), v) }))
        case "cursors" => Some((StructType(Seq(
            StructField("name", StringType),
            StructField("version", IntegerType),
            StructField("updated_millis", LongType))),
          () => t.cursors().values.toSeq.sortBy(_.name).map(c =>
            InternalRow(utf(c.name), c.version, c.updatedMillis))))
        case "partitions" => Some((StructType(Seq(
            StructField("partition", StringType),
            StructField("num_files", LongType),
            StructField("rows", LongType))),
          () => {
            val tbl = t
            tbl.entries(asOf.orElse(tbl.latestVersion))
              .groupBy(e => partOf(e.rel)).toSeq.sortBy(_._1)
              .map { case (p, es) =>
                val counts = es.flatMap(_.stats.get(TxLogTable.RowsKey)
                  .map(_._1))
                InternalRow(utf(p), es.size.toLong,
                  // NULL when any file lacks a recorded count — a
                  // wrong number is worse than an absent one
                  if (counts.size == es.size) Long.box(counts.sum)
                  else null)
              }
          }))
        case _ => None
      }
    fields.map { case (sch, mkRows) =>
      new Table with SupportsRead {
        override def name(): String = ident.toString
        override def schema(): StructType = sch
        override def capabilities(): util.Set[TableCapability] =
          util.EnumSet.of(TableCapability.BATCH_READ)
        override def newScanBuilder(opts: CaseInsensitiveStringMap)
            : ScanBuilder = () =>
          new org.apache.spark.sql.connector.read.LocalScan {
            override def readSchema(): StructType = sch
            override def rows(): Array[InternalRow] = mkRows().toArray
          }
      }
    }
  }

  /** `SELECT ... FROM t VERSION AS OF <n | 'tag'>` — SQL time travel to
    * a manifest version (the format's native coordinate) or a named TAG
    * (the immutable ref `TxLogTable.tag` created — "what did
    * training-run-X read" stays answerable by name).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) {
      // `SELECT ... FROM t.files VERSION AS OF <n | 'tag'>` — metadata
      // tables are versioned relations too: files/partitions serve the
      // manifest AT the coordinate, history truncates there
      val mv = scala.util.Try(version.toInt).toOption
        .orElse(metaParentTagVersion(ident, version))
      return mv.flatMap(v => metaTableFor(ident, Some(v))).getOrElse(
        throw new NoSuchTableException(ident))
    }
    val t = TxLogTable(spark, pathOf(ident).toString)
    val v = scala.util.Try(version.toInt).toOption
      .orElse(t.versionOfTag(version)).getOrElse(
        throw new IllegalArgumentException(
          s"'$version' is neither a version number nor a tag of " +
            s"${ident.toString} (tags: ${t.tags().keys.mkString(",")})"))
    require(t.versions.contains(v),
      s"version $v of ${ident.toString} does not exist (or was vacuumed); " +
        s"surviving versions: ${t.versions.mkString(",")}")
    TxLogV2Table(spark, pathOf(ident).toString, ident.toString, Some(v))
  }

  // tag resolution for a METADATA table's AS OF: the tag lives on the
  // parent data table the metadata ident wraps
  private def metaParentTagVersion(ident: Identifier,
                                   tag: String): Option[Int] = {
    if (ident.namespace().length < 1) return None
    val parent = Identifier.of(ident.namespace.init, ident.namespace.last)
    if (!tableExists(parent)) return None
    TxLogTable(spark, pathOf(parent).toString).versionOfTag(tag)
  }

  /** `SELECT ... FROM t TIMESTAMP AS OF <ts>` — Spark hands micros since
    * epoch; resolve to the latest version committed at or before it.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (!tableExists(ident)) {
      // `FROM t.files TIMESTAMP AS OF ts` — same resolution as the data
      // table's, then the metadata view pins to the resolved version
      if (ident.namespace().length >= 1) {
        val parent = Identifier.of(ident.namespace.init,
          ident.namespace.last)
        if (tableExists(parent)) {
          val mt = TxLogTable(spark, pathOf(parent).toString)
            .versionAsOf(timestampMicros / 1000L)
            .flatMap(v => metaTableFor(ident, Some(v)))
          if (mt.isDefined) return mt.get
        }
      }
      throw new NoSuchTableException(ident)
    }
    val t = TxLogTable(spark, pathOf(ident).toString)
    val v = t.versionAsOf(timestampMicros / 1000L).getOrElse(
      throw new IllegalArgumentException(
        s"no version of ${ident.toString} existed at " +
          s"epoch-micros $timestampMicros"))
    TxLogV2Table(spark, pathOf(ident).toString, ident.toString, Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (tableExists(ident))
      throw new TableAlreadyExistsException(ident.toString)
    // `PARTITIONED BY ([idCols...,] bucket(n1, k1) [, bucket(n2, k2)...])`
    // — identity hive columns plus hash-bucket transforms on hidden
    // derived columns, ONE KEY COLUMN EACH (the date+bucket fact layout,
    // or a bucket GRID for a composite join key); see
    // TxLogTable.bucketSpecsOf
    val (bucketTs, idTs) = partitions.toSeq.partition(_.name == "bucket")
    // `PARTITIONED BY (years|months|days|hours(ts))` — Iceberg-style
    // HIDDEN time partitioning: the transform becomes a hidden derived
    // calendar level (TxLogTable.timeColAt) and the source stays a
    // plain TIMESTAMP column; see TxLogTable.timeSpecsOf. Non-bucket
    // levels keep the user's declared order.
    val timeUnitOf = Map("years" -> "year", "months" -> "month",
      "days" -> "day", "hours" -> "hour")
    val timeSpecs = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val idCols = idTs.map { t =>
      if (timeUnitOf.contains(t.name)) {
        require(t.references.length == 1,
          s"time transform takes exactly one source column: $t")
        val src = t.references.head.fieldNames.mkString(".")
        val tc = TxLogTable.timeColAt(timeSpecs.length)
        timeSpecs += ((src, timeUnitOf(t.name)))
        tc
      } else {
        require(t.name == "identity" && t.references.length == 1,
          s"txlog supports identity, bucket, or years/months/days/hours " +
            s"partitioning, got $t")
        t.references.head.fieldNames.mkString(".")
      }
    }
    val bucketSpecs = bucketTs.map { bt =>
      import org.apache.spark.sql.connector.expressions.{Literal => VLit, NamedReference}
      val n = bt.arguments.collectFirst {
        case l: VLit[_] if l.dataType ==
            org.apache.spark.sql.types.IntegerType =>
          l.value.asInstanceOf[Int]
      }.getOrElse(throw new IllegalArgumentException(
        s"bucket transform needs an integer bucket count: $bt"))
      val refs = bt.arguments.toSeq.collect { case r: NamedReference => r }
      // a multi-column tuple-hash transform is refused LOUDLY, with the
      // working alternative: Spark's SPJ planner only key-groups
      // single-argument transforms (KeyGroupedPartitioning
      // .supportsExpressions requires transform.children.size == 1 —
      // sql/catalyst partitioning.scala), so bucket(n, k1, k2) would
      // accept the write but silently shuffle every join. The bucket
      // GRID gives composite keys the zero-shuffle join Spark can
      // actually plan.
      require(refs.length == 1,
        s"txlog bucket transform takes exactly ONE key column, got $bt " +
          "— for a composite key use a bucket grid: " +
          "PARTITIONED BY (bucket(n1, k1), bucket(n2, k2))")
      (refs.head.fieldNames.mkString("."), n)
    }
    // the hidden bucket dirs nest INNERMOST (`p=../_bkt=../_bkt1=..`):
    // identity prunes (static and DPP) cut whole date dirs first, the
    // bucket ids refine within
    val partCols = idCols ++
      bucketSpecs.indices.map(TxLogTable.bucketColAt)
    val bloomCols = Option(properties.get("bloomCols")).toSeq
      .flatMap(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    // TBLPROPERTIES('sortCols'='k1,k2'): declared within-file sort order,
    // enforced at the staging chokepoint — what lets the SPJ scan report
    // a V2 output ordering and merge joins skip their Sorts
    val sortCols = Option(properties.get("sortCols")).toSeq
      .flatMap(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    // TBLPROPERTIES('ndvCols'='k1,k2'): maintain a KMV distinct-count
    // sketch per listed column across commits — surfaced to the planner
    // as V2 columnStats (CBO filter selectivity / broadcast sizing)
    val ndvCols = Option(properties.get("ndvCols")).toSeq
      .flatMap(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    // TBLPROPERTIES('optimizeWrite'='true'): route every user-facing
    // write through a REBALANCE shuffle so AQE sizes output files toward
    // the advisory partition size — small-file prevention at ingest
    val optimizeWrite =
      Option(properties.get("optimizeWrite")).exists(_.trim.toBoolean)
    TxLogTable(spark, pathOf(ident).toString)
      .create(schema, partCols, bloomCols, bucketSpecs, sortCols, ndvCols,
        optimizeWrite, timeSpecs.toSeq)
    TxLogV2Table(spark, pathOf(ident).toString, ident.toString)
  }

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    val t = TxLogTable(spark, pathOf(ident).toString)
    if (t.latestVersion.isEmpty) throw new NoSuchTableException(ident)
    changes.foreach {
      case rc: TableChange.RenameColumn =>
        require(rc.fieldNames.length == 1,
          "txlog: nested column rename unsupported")
        t.renameColumn(rc.fieldNames.head, rc.newName)
      case dc: TableChange.DeleteColumn =>
        require(dc.fieldNames.length == 1,
          "txlog: nested column drop unsupported")
        t.dropColumn(dc.fieldNames.head)
      case ac: TableChange.AddColumn =>
        require(ac.fieldNames.length == 1,
          "txlog: nested column add unsupported")
        require(ac.isNullable,
          "txlog: added columns must be nullable (old files fill NULL, " +
            "or the declared DEFAULT)")
        // a DEFAULT rides as Spark's own field-metadata keys (via the
        // analyzer's conversion, ColumnDefaultsShim): INSERTs omitting
        // the column fill CURRENT_DEFAULT, files predating it fill
        // EXISTS_DEFAULT at read instead of NULL
        t.addColumn(ac.fieldNames.head, ac.dataType,
          metadata = org.apache.spark.sql.graft.ColumnDefaultsShim
            .addColumnMetadata(ac))
      case ut: TableChange.UpdateColumnType =>
        require(ut.fieldNames.length == 1,
          "txlog: nested column type change unsupported")
        t.widenColumn(ut.fieldNames.head, ut.newDataType)
      case other =>
        throw new UnsupportedOperationException(
          s"txlog: unsupported table change $other")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val root = pathOf(ident)
    if (!Files.isDirectory(root)) return false
    scala.util.Using.resource(Files.walk(root)) { s =>
      s.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
    }
    true
  }

  override def renameTable(old: Identifier, to: Identifier): Unit = {
    if (!tableExists(old)) throw new NoSuchTableException(old)
    if (tableExists(to))
      throw new TableAlreadyExistsException(to.toString)
    Files.createDirectories(pathOf(to).getParent)
    Files.move(pathOf(old), pathOf(to))
  }

  // ---- SQL maintenance surface: CALL <cat>.system.{compact,vacuum,
  // history}('ns.table') — the lifecycle every table needs at scale,
  // reachable without the library API (Spark 4 stored procedures).

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.unsafe.types.UTF8String

  private def tableByName(qualified: String): TxLogTable = {
    val parts = qualified.split('.')
    require(parts.nonEmpty && parts.forall(_.nonEmpty),
      s"procedure table argument must be 'ns.table', got '$qualified'")
    val ident = Identifier.of(parts.init, parts.last)
    if (tableExists(ident))
      return TxLogTable(spark, pathOf(ident).toString)
    // 'ns.t.branch_<name>' — the same branch-handle surface the
    // relation resolver exposes, so procedures (refresh_mv, compact,
    // …) address a branch exactly like SELECT/DML do
    if (ident.name.startsWith("branch_") && ident.namespace().nonEmpty) {
      val parent = Identifier.of(ident.namespace.init,
        ident.namespace.last)
      val bn = ident.name.stripPrefix("branch_")
      if (tableExists(parent)) {
        val t = TxLogTable(spark, pathOf(parent).toString)
        if (t.branches().contains(bn)) return t.branchTable(bn)
      }
    }
    throw new IllegalArgumentException(s"no such txlog table: $qualified")
  }

  // MV measure spec: 'out:src' (sum) or 'out:min:src' / 'out:max:src' —
  // returns (sums, mins, maxs)
  private def parseAggSpec(sv: String): (Seq[(String, String)],
      Seq[(String, String)], Seq[(String, String)]) = {
    val items = sv.split(',').toSeq.map(_.trim).filter(_.nonEmpty).map {
      t => t.split(':') match {
        case Array(out, src) => ("sum", out, src)
        case Array(out, agg, src)
            if Set("sum", "min", "max")(agg) => (agg, out, src)
        case _ => throw new IllegalArgumentException(
          s"measure spec must be 'out:src' or 'out:min|max:src': '$t'")
      }
    }
    (items.collect { case ("sum", o, c) => o -> c },
      items.collect { case ("min", o, c) => o -> c },
      items.collect { case ("max", o, c) => o -> c })
  }

  // warehouse path for a name that is a DIRECTORY of txlog tables (an
  // ANN index root), not itself a table — no existence requirement
  private def pathByName(qualified: String): Path = {
    val parts = qualified.split('.')
    require(parts.nonEmpty && parts.forall(_.nonEmpty),
      s"procedure path argument must be 'ns.name', got '$qualified'")
    pathOf(Identifier.of(parts.init, parts.last))
  }

  // one-row result delivered through a LocalScan (driver-side rows are
  // exactly what a maintenance summary is)
  private def resultScan(schema: StructType,
                         rs: Seq[InternalRow]): java.util.Iterator[
      org.apache.spark.sql.connector.read.Scan] =
    java.util.List.of[org.apache.spark.sql.connector.read.Scan](
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] = rs.toArray
      }).iterator()

  // a CALL result carrying a (bounded, dashboard-sized) DataFrame
  private def dfScan(df: org.apache.spark.sql.DataFrame): java.util
      .Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(df.schema)
    resultScan(df.schema,
      df.collect().toSeq.map(r => conv(r).asInstanceOf[InternalRow]))
  }

  private abstract class MaintenanceProc(procName: String,
                                         params: Seq[ProcedureParameter])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
  }

  private def inParam(n: String, dt: org.apache.spark.sql.types.DataType,
                      default: Option[String] = None): ProcedureParameter = {
    val b = ProcedureParameter.in(n, dt)
    default.foreach(b.defaultValue)
    b.build()
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      Array("compact", "vacuum", "history", "partitions", "restore",
        "clone", "zorder", "rebucket", "semdedup", "dedup_near",
        "bm25", "optimize", "detail", "analyze", "resort", "changes",
        "ann_build", "ann_refresh", "ann_search", "ann_build_auto",
        "ann_status",
        "cursors", "release_cursor", "delete_pos", "update_pos",
        "set_time_unit", "tag", "drop_tag", "tags", "ann_search_batch",
        "branch", "publish", "drop_branch", "branches",
        "create_mv", "create_mv_joined", "refresh_mv", "mv_status",
        "mvs", "remove_orphans", "create_mv_distinct", "create_mv_hist",
        "mv_distinct", "mv_quantile", "mv_branch", "mv_publish",
        "refresh_all", "create_mv_distinct_exact")
        .map(Identifier.of(Array("system"), _))
    else Array.empty

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace.sameElements(Array("system")),
      s"procedures live in the 'system' namespace, got ${ident.toString}")
    import org.apache.spark.sql.types._
    ident.name match {
      case "compact" =>
        // CALL c.system.compact('ns.t' [, files [, partition]]): rewrite
        // the current snapshot into `files` files per partition (1 = full
        // compaction; MOR tombstones fold in, the usual prerequisite for
        // row-level DML on a MOR table). With the optional `partition`
        // spec ('col=value', comma-separated for multiple columns) only
        // THAT partition's files rewrite and the rest carry by manifest
        // reference — OPTIMIZE for the hot partition of a 100 TB table,
        // O(partition) instead of O(table).
        new MaintenanceProc("compact", Seq(
          inParam("table", StringType),
          inParam("files", IntegerType, Some("1")),
          inParam("partition", StringType, Some("NULL")))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            val files = if (input.isNullAt(1)) 1 else input.getInt(1)
            val before = t.fileCount()
            val schema = t.tableSchema.getOrElse(
              TxLogV2Table(spark, t.root, input.getString(0)).schema)
            val v =
              if (input.isNullAt(2)) t.compact(schema, files)
              else {
                val preds = input.getString(2).split(',').iterator
                  .map(_.trim).filter(_.nonEmpty).map { kv =>
                    val i = kv.indexOf('=')
                    require(i > 0, s"partition spec entry '$kv' is not " +
                      "col=value")
                    kv.substring(0, i).trim ->
                      Set(kv.substring(i + 1).trim)
                  }.toMap
                t.compactWhere(schema, preds, files).version
              }
            resultScan(StructType(Seq(
              StructField("version", IntegerType),
              StructField("files_before", IntegerType),
              StructField("files_after", IntegerType))),
              Seq(InternalRow(v, before, t.fileCount())))
          }
        }
      case "vacuum" =>
        // CALL c.system.vacuum('ns.t' [, keep [, min_age_ms
        // [, retain_ms]]]): drop all but the last `keep` manifests and
        // delete unreferenced data files older than min_age_ms (the age
        // guard protects in-flight writers, exactly like the API
        // default). retain_ms is the lagging-reader time floor — a
        // manifest younger than it survives regardless of `keep`; the
        // 7-day default makes a bare CALL safe on a live streamed table
        new MaintenanceProc("vacuum", Seq(
          inParam("table", StringType),
          inParam("keep", IntegerType, Some("1")),
          inParam("min_age_ms", LongType,
            Some(TxLogTable.DefaultVacuumMinAgeMillis.toString)),
          inParam("retain_ms", LongType,
            Some(TxLogTable.DefaultVacuumRetainMillis.toString)),
          // dry_run => true: report what would be reclaimed, touch
          // nothing — the pre-flight before a retention change
          inParam("dry_run", org.apache.spark.sql.types.BooleanType,
            Some("false")))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            val keep = if (input.isNullAt(1)) 1 else input.getInt(1)
            val age = if (input.isNullAt(2))
              TxLogTable.DefaultVacuumMinAgeMillis else input.getLong(2)
            val retain = if (input.isNullAt(3))
              TxLogTable.DefaultVacuumRetainMillis else input.getLong(3)
            val dry = !input.isNullAt(4) && input.getBoolean(4)
            val (manifests, files) = t.vacuum(keep, age, retain, dry)
            resultScan(StructType(Seq(
              StructField("manifests_deleted", IntegerType),
              StructField("files_deleted", IntegerType))),
              Seq(InternalRow(manifests, files)))
          }
        }
      case "delete_pos" =>
        // CALL c.system.delete_pos('ns.t', '<predicate>'): positional
        // (deletion-vector) DELETE — matched rows are masked by (file,
        // position), the commit is O(matched rows) and rewrites ZERO
        // data files (the `files_rewritten` output is the proof). The
        // non-key-predicate complement of the MOR tombstone path; COW
        // `DELETE FROM` remains the bulk path.
        new MaintenanceProc("delete_pos", Seq(
          inParam("table", StringType),
          inParam("predicate", StringType))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            require(!input.isNullAt(1), "delete_pos needs a predicate")
            val schema = t.tableSchema.getOrElse(
              TxLogV2Table(spark, t.root, input.getString(0)).schema)
            val v0 = t.latestVersion.getOrElse(-1)
            val st = t.deleteWherePos(schema,
              org.apache.spark.sql.functions.expr(input.getString(1)))
            val masked = // a no-op (nothing matched) commits no version
              if (st.version <= v0) 0L
              else t.dvsOf(st.version).filter(_.v == st.version)
                .map(_.n).sum
            resultScan(StructType(Seq(
              StructField("version", IntegerType),
              StructField("rows_deleted", LongType),
              StructField("files_rewritten", IntegerType))),
              Seq(InternalRow(st.version, masked, st.rewritten)))
          }
        }
      case "update_pos" =>
        // CALL c.system.update_pos('ns.t', '<predicate>', '<set>'):
        // positional UPDATE — matched rows are masked where they sit
        // and re-staged ONCE with the assignments applied (new files
        // hold ONLY the touched rows). `set` is ';'-separated
        // `col = <expr>` pairs, each expr a SQL expression over the
        // row's old values (`x = x + 1` increments). ';' separates
        // because exprs legitimately contain commas; '=' splits at the
        // first occurrence (column names are wire-safe).
        new MaintenanceProc("update_pos", Seq(
          inParam("table", StringType),
          inParam("predicate", StringType),
          inParam("set", StringType))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            require(!input.isNullAt(1) && !input.isNullAt(2),
              "update_pos needs a predicate and a set clause")
            val schema = t.tableSchema.getOrElse(
              TxLogV2Table(spark, t.root, input.getString(0)).schema)
            val assigns = input.getString(2).split(';').iterator
              .map(_.trim).filter(_.nonEmpty).map { kv =>
                val i = kv.indexOf('=')
                require(i > 0, s"set entry '$kv' is not col = expr")
                kv.substring(0, i).trim ->
                  org.apache.spark.sql.functions.expr(kv.substring(i + 1))
              }.toSeq
            val v0 = t.latestVersion.getOrElse(-1)
            val st = t.updateWherePos(schema,
              org.apache.spark.sql.functions.expr(input.getString(1)),
              assigns)
            val masked = // a no-op (nothing matched) commits no version
              if (st.version <= v0) 0L
              else t.dvsOf(st.version).filter(_.v == st.version)
                .map(_.n).sum
            resultScan(StructType(Seq(
              StructField("version", IntegerType),
              StructField("rows_updated", LongType),
              StructField("files_rewritten", IntegerType))),
              Seq(InternalRow(st.version, masked, st.rewritten)))
          }
        }
      case "set_time_unit" =>
        // CALL c.system.set_time_unit('ns.t', 'ts', 'hour'): hidden-
        // partition SPEC EVOLUTION — change a time transform's
        // granularity as a metadata-only commit. Old files keep their
        // old-unit dirs (pruning is per-file-unit exact); a later full
        // compaction converges the layout. `mixed_layout` reports
        // whether the table currently holds both units.
        new MaintenanceProc("set_time_unit", Seq(
          inParam("table", StringType),
          inParam("source", StringType),
          inParam("unit", StringType))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            require(!input.isNullAt(1) && !input.isNullAt(2),
              "set_time_unit needs a source column and a unit")
            val v = t.alterTimeUnit(input.getString(1),
              input.getString(2))
            resultScan(StructType(Seq(
              StructField("version", IntegerType),
              StructField("mixed_layout",
                org.apache.spark.sql.types.BooleanType))),
              Seq(InternalRow(v, t.timeUnitsMixed(v))))
          }
        }
      case "history" =>
        // CALL c.system.history('ns.t'): one row per surviving version
        new MaintenanceProc("history", Seq(
          inParam("table", StringType))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            resultScan(StructType(Seq(
              StructField("version", IntegerType),
              StructField("commit_millis", LongType),
              StructField("op", StringType),
              StructField("n_files", IntegerType))),
              t.history().map(h => InternalRow(h.version,
                h.commitMillis.map(Long.box).orNull,
                h.op.map(UTF8String.fromString).orNull, h.numFiles)))
          }
        }
      case "partitions" =>
        // CALL c.system.partitions('ns.t'): one row per partition value
        // with file/row counts from the MANIFEST alone — no file opened;
        // SHOW PARTITIONS with sizes, free at any table size. Row counts
        // are exact per-file footer sums; they are NULL (unknown) when a
        // file predates stats or live MOR tombstones hide rows — the
        // same exactness contract as the metadata aggregates. A
        // non-partitioned table reports one row with an empty partition.
        new MaintenanceProc("partitions", Seq(
          inParam("table", StringType))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            val v = t.latestVersion
            val parts = v.map(t.partitionColsOf).getOrElse(Nil)
            val tombs = v.exists(t.tombstonesOf(_).nonEmpty)
            // positional-delete masks are per target FILE with exact
            // counts, so per-partition rows stay exact by subtraction
            // (tombstones cannot: their match count needs a scan)
            val dvByFile = v.map(t.dvsOf).getOrElse(Nil)
              .groupMapReduce(_.file)(_.n)(_ + _)
            val groups = t.entries(None).groupBy { e =>
              val segs = TxLogTable.partitionSegmentsOf(e.rel)
              parts.flatMap(c => segs.get(c).map(v => s"$c=$v"))
                .mkString("/")
            }
            resultScan(StructType(Seq(
              StructField("partition", StringType),
              StructField("n_files", IntegerType),
              StructField("n_rows", LongType))),
              groups.toSeq.sortBy(_._1).map { case (p, es) =>
                val rows = es.flatMap(
                  _.stats.get(TxLogTable.RowsKey).map(_._1))
                val dvSub = es.map(e =>
                  dvByFile.getOrElse(e.rel, 0L)).sum
                InternalRow(UTF8String.fromString(p), es.size,
                  if (!tombs && rows.size == es.size)
                    Long.box(rows.sum - dvSub)
                  else null)
              })
          }
        }
      case "cursors" =>
        // CALL c.system.cursors('ns.t'): one row per registered change-
        // feed cursor — which consumers pin history, at which version,
        // and when they last advanced. The operator's "who is holding my
        // vacuum back" view (Kafka's consumer-group listing).
        new MaintenanceProc("cursors", Seq(
          inParam("table", StringType))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            resultScan(StructType(Seq(
              StructField("name", StringType),
              StructField("version", IntegerType),
              StructField("updated_millis", LongType))),
              t.cursors().values.toSeq.sortBy(_.name).map(c =>
                InternalRow(UTF8String.fromString(c.name), c.version,
                  c.updatedMillis)))
          }
        }
      case "release_cursor" =>
        // CALL c.system.release_cursor('ns.t', 'name'): drop a cursor's
        // vacuum pin — the explicit decommissioning act for an abandoned
        // consumer; afterwards its history is reclaimable and a late
        // resume hits the change feed's loud vacuum-horizon refusal.
        new MaintenanceProc("release_cursor", Seq(
          inParam("table", StringType),
          inParam("name", StringType))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            require(!input.isNullAt(1), "release_cursor needs a name")
            val released = t.releaseCursor(input.getString(1))
            resultScan(StructType(Seq(
              StructField("released", org.apache.spark.sql.types
                .BooleanType))),
              Seq(InternalRow(released)))
          }
        }
      case "tag" =>
        // CALL c.system.tag('ns.t', 'name' [, version]): create an
        // IMMUTABLE named ref at `version` (default: latest) — read it
        // back with `VERSION AS OF 'name'`; vacuum keeps the floor at
        // the oldest tag. Re-pointing is drop_tag + tag, both explicit.
        new MaintenanceProc("tag", Seq(
          inParam("table", StringType),
          inParam("name", StringType),
          inParam("version", IntegerType, Some("NULL")))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            require(!input.isNullAt(1), "tag needs a name")
            val v = t.tag(input.getString(1),
              if (input.isNullAt(2)) None else Some(input.getInt(2)))
            resultScan(StructType(Seq(
              StructField("name", StringType),
              StructField("version", IntegerType))),
              Seq(InternalRow(UTF8String.fromString(input.getString(1)),
                v)))
          }
        }
      case "drop_tag" =>
        // CALL c.system.drop_tag('ns.t', 'name'): release the ref and
        // its retention pin — the tagged history becomes reclaimable.
        new MaintenanceProc("drop_tag", Seq(
          inParam("table", StringType),
          inParam("name", StringType))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            require(!input.isNullAt(1), "drop_tag needs a name")
            resultScan(StructType(Seq(
              StructField("dropped", org.apache.spark.sql.types
                .BooleanType))),
              Seq(InternalRow(t.dropTag(input.getString(1)))))
          }
        }
      case "tags" =>
        // CALL c.system.tags('ns.t'): the named refs and their pinned
        // versions — "which snapshots can still be named".
        new MaintenanceProc("tags", Seq(
          inParam("table", StringType))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            resultScan(StructType(Seq(
              StructField("name", StringType),
              StructField("version", IntegerType))),
              t.tags().toSeq.sortBy(_._1).map { case (n, v) =>
                InternalRow(UTF8String.fromString(n), v) })
          }
        }
      case "branch" =>
        // CALL c.system.branch('ns.t', 'name' [, version]): fork a
        // WRITABLE branch at `version` (default: head) — write-audit-
        // publish. Every write path targets it via the
        // `ns.t.branch_<name>` identifier; main readers never see branch
        // commits until CALL system.publish fast-forwards them.
        new MaintenanceProc("branch", Seq(
          inParam("table", StringType),
          inParam("name", StringType),
          inParam("version", IntegerType, Some("NULL")))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            require(!input.isNullAt(1), "branch needs a name")
            val fork = t.createBranch(input.getString(1),
              if (input.isNullAt(2)) None else Some(input.getInt(2)))
            resultScan(StructType(Seq(
              StructField("name", StringType),
              StructField("forked_from", IntegerType))),
              Seq(InternalRow(UTF8String.fromString(input.getString(1)),
                fork)))
          }
        }
      case "publish" =>
        // CALL c.system.publish('ns.t', 'name'): fast-forward the branch
        // head onto main as ONE atomic version (op=publish, delta-encoded
        // against main's head). Refuses if main moved since the fork —
        // re-branch and replay, never a silent merge.
        new MaintenanceProc("publish", Seq(
          inParam("table", StringType),
          inParam("name", StringType))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            require(!input.isNullAt(1), "publish needs a branch name")
            val v = t.publishBranch(input.getString(1))
            resultScan(StructType(Seq(
              StructField("published_version", IntegerType))),
              Seq(InternalRow(v)))
          }
        }
      case "drop_branch" =>
        // CALL c.system.drop_branch('ns.t', 'name'): delete the branch
        // log; files only it referenced become vacuum-reclaimable.
        new MaintenanceProc("drop_branch", Seq(
          inParam("table", StringType),
          inParam("name", StringType))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            require(!input.isNullAt(1), "drop_branch needs a name")
            resultScan(StructType(Seq(
              StructField("dropped", org.apache.spark.sql.types
                .BooleanType))),
              Seq(InternalRow(t.dropBranch(input.getString(1)))))
          }
        }
      case "branches" =>
        // CALL c.system.branches('ns.t'): live branches, their heads,
        // and fork points — "what work is in flight against this table".
        new MaintenanceProc("branches", Seq(
          inParam("table", StringType))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            resultScan(StructType(Seq(
              StructField("name", StringType),
              StructField("head", IntegerType),
              StructField("forked_from", IntegerType))),
              t.branches().map { n =>
                val bt = t.branchTable(n)
                InternalRow(UTF8String.fromString(n),
                  bt.latestVersion.getOrElse(-1),
                  bt.forkedFrom.getOrElse(-1))
              })
          }
        }
      case "restore" =>
        // CALL c.system.restore('ns.t', version): roll the table back to
        // `version` as a NEW commit — O(manifest), no data file touched,
        // history preserved. The bad-write undo button.
        new MaintenanceProc("restore", Seq(
          inParam("table", StringType),
          inParam("version", IntegerType))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            require(!input.isNullAt(1), "restore needs a target version")
            val v = t.restore(input.getInt(1))
            resultScan(StructType(Seq(
              StructField("version", IntegerType),
              StructField("restored_version", IntegerType),
              StructField("n_files", IntegerType))),
              Seq(InternalRow(v, input.getInt(1), t.fileCount())))
          }
        }
      case "clone" =>
        // CALL c.system.clone('ns.src', 'ns.dst'): zero-copy clone of the
        // source's current snapshot as a fresh catalog table — manifest
        // republished as the clone's v0, data files hard-linked (no byte
        // copied). The dev/test-against-prod-data idiom: at 100 TB a
        // CTAS copy is hours and doubles storage; this is O(files)
        // metadata ops.
        new MaintenanceProc("clone", Seq(
          inParam("source", StringType),
          inParam("dest", StringType))) {
          override def call(input: InternalRow) = {
            val src = tableByName(input.getString(0))
            val parts = input.getString(1).split('.')
            require(parts.length >= 2 && parts.forall(_.nonEmpty),
              s"clone dest must be 'ns.table', got '${input.getString(1)}'")
            val dident = Identifier.of(parts.init, parts.last)
            require(!tableExists(dident),
              s"clone destination already exists: ${input.getString(1)}")
            src.cloneTo(pathOf(dident).toString)
            resultScan(StructType(Seq(
              StructField("version", IntegerType),
              StructField("n_files", IntegerType))),
              Seq(InternalRow(0, src.fileCount())))
          }
        }
      case "zorder" =>
        // CALL c.system.zorder('ns.t', 'colA', 'colB' [, files]):
        // OPTIMIZE ZORDER BY — rewrite the snapshot clustered on the
        // Morton curve so manifest min/max stats prune range scans on
        // EVERY listed dimension (a plain sort serves only its leading
        // column). col_a may carry a comma-separated list for 3+
        // dimensions — 'a,b,c' with col_b NULL — since stored-procedure
        // signatures are fixed-arity; per-dim grid bits shrink as
        // min(16, 63/N). The multi-dimensional skipping layout for the
        // 100 TB point-lookup table.
        // ... [, partition]: 'col=value' (comma-separated) scopes the
        // rewrite to matching partition dirs (compactZOrderWhere) — the
        // incremental-clustering form: z-order yesterday's partition
        // after it closes, O(partition) per day, never O(table)
        new MaintenanceProc("zorder", Seq(
          inParam("table", StringType),
          inParam("col_a", StringType),
          inParam("col_b", StringType, Some("NULL")),
          inParam("files", IntegerType, Some("8")),
          inParam("partition", StringType, Some("NULL")))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            val schema = t.tableSchema.getOrElse(
              TxLogV2Table(spark, t.root, input.getString(0)).schema)
            val files = if (input.isNullAt(3)) 8 else input.getInt(3)
            val zCols = input.getString(1).split(",").toSeq
              .map(_.trim).filter(_.nonEmpty) ++
              (if (input.isNullAt(2)) Nil else Seq(input.getString(2)))
            val v =
              if (input.isNullAt(4)) t.compactZOrder(schema, zCols, files)
              else {
                val preds = input.getString(4).split(',').iterator
                  .map(_.trim).filter(_.nonEmpty).map { kv =>
                    val i = kv.indexOf('=')
                    require(i > 0, s"partition spec entry '$kv' is not " +
                      "col=value")
                    kv.substring(0, i).trim ->
                      Set(kv.substring(i + 1).trim)
                  }.toMap
                t.compactZOrderWhere(schema, preds, zCols, files).version
              }
            resultScan(StructType(Seq(
              StructField("version", IntegerType),
              StructField("files_after", IntegerType))),
              Seq(InternalRow(v, t.fileCount())))
          }
        }
      case "rebucket" =>
        // CALL c.system.rebucket('ns.t', new_buckets [, files]):
        // bucket-spec evolution — full rewrite re-deriving the hidden
        // bucket ids under the new count plus an atomic manifest spec
        // bump. THE maintenance lever when a bucketed table outgrows its
        // CREATE-time count: per-bucket bytes scale with the corpus, and
        // KeyGroupedPartitioning is the one plan AQE skew-splitting
        // cannot touch, so the operator re-picks n (typically 2×) and
        // every subsequent SPJ is balanced again. O(table) once, by
        // choice — see TxLogTable.rebucket for why not a dual-spec read.
        new MaintenanceProc("rebucket", Seq(
          inParam("table", StringType),
          inParam("buckets", IntegerType),
          inParam("key", StringType, Some("NULL")),
          inParam("files", IntegerType, Some("0")),
          inParam("target_bytes", LongType, Some(
            graft.sources.TxLogTable.RebucketTargetBytes.toString)),
          // a second grid level evolved in the SAME rewrite — one
          // O(table) pass, one version bump, never two
          inParam("buckets2", IntegerType, Some("NULL")),
          inParam("key2", StringType, Some("NULL")))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            require(!input.isNullAt(1), "rebucket needs a bucket count")
            val newN = input.getInt(1)
            val key = if (input.isNullAt(2)) None
              else Some(input.getString(2))
            val files = if (input.isNullAt(3)) 0 else input.getInt(3)
            val tgtB = if (input.isNullAt(4))
              graft.sources.TxLogTable.RebucketTargetBytes
              else input.getLong(4)
            val also =
              if (input.isNullAt(5)) {
                // symmetric with the branch below: a key2 with no
                // buckets2 must fail loudly, not silently drop the
                // second grid level the caller asked for
                require(input.isNullAt(6),
                  "rebucket key2 needs buckets2")
                Nil
              } else {
                require(!input.isNullAt(6),
                  "rebucket buckets2 needs key2")
                Seq(input.getString(6) -> input.getInt(5))
              }
            val specs = t.latestVersion.map(t.bucketSpecsOf)
              .getOrElse(Nil)
            val before = key.flatMap(k =>
                specs.find(_._1 == k)).orElse(specs.headOption)
              .map(_._2).getOrElse(0)
            val schema = t.tableSchema.getOrElse(
              TxLogV2Table(spark, t.root, input.getString(0)).schema)
            val v = t.rebucket(schema, newN, key, files,
              targetBytes = tgtB, alsoKeys = also)
            resultScan(StructType(Seq(
              StructField("version", IntegerType),
              StructField("buckets_before", IntegerType),
              StructField("buckets_after", IntegerType),
              StructField("n_files", IntegerType))),
              Seq(InternalRow(v, before, newN, t.fileCount())))
          }
        }
      case "ann_build" =>
        // CALL c.system.ann_build('ns.corpus', 'ns.idx' [, k [, iters
        // [, pq]]]): train and persist an ANN index over the corpus's
        // CURRENT version (graft.operators.AnnIndex.build) — the index
        // lands as txlog tables under the 'ns.idx' warehouse path
        // (meta/centroids/assignments[/codes/codebook]). The SQL-first
        // operator of the 100 TB catalog builds serving indexes without
        // leaving SQL.
        new MaintenanceProc("ann_build", Seq(
          inParam("corpus", StringType),
          inParam("index", StringType),
          inParam("k", IntegerType, Some("8")),
          inParam("iterations", IntegerType, Some("2")),
          inParam("pq", BooleanType, Some("true")),
          inParam("sq8", BooleanType, Some("false")))) {
          override def call(input: InternalRow) = {
            val src = tableByName(input.getString(0))
            val idxRoot = pathByName(input.getString(1)).toString
            val k = if (input.isNullAt(2)) 8 else input.getInt(2)
            val it = if (input.isNullAt(3)) 2 else input.getInt(3)
            val pq = input.isNullAt(4) || input.getBoolean(4)
            val sq8 = !input.isNullAt(5) && input.getBoolean(5)
            val schema = src.tableSchema.getOrElse(
              TxLogV2Table(spark, src.root, input.getString(0)).schema)
            require(Seq("vec_id", "embedding").forall(
              schema.fieldNames.contains),
              "ann_build corpus needs (vec_id, embedding) columns")
            val pinned = graft.operators.AnnIndex.build(
              spark, src.root, idxRoot, schema, k, it, pq, sq8)
            resultScan(StructType(Seq(
              StructField("pinned_version", IntegerType))),
              Seq(InternalRow(pinned)))
          }
        }
      case "ann_build_auto" =>
        // CALL c.system.ann_build_auto('ns.corpus', 'ns.idx'
        // [, target_cell [, train_sample [, iters [, pq [, sq8]]]]]):
        // the auto-sized build (graft.operators.AnnIndex.buildAuto) —
        // k derives from the corpus so cell SIZE is the invariant, and
        // the quantizer trains on a bounded deterministic sample, so
        // training cost is O(sample × k) at any corpus size.
        new MaintenanceProc("ann_build_auto", Seq(
          inParam("corpus", StringType),
          inParam("index", StringType),
          inParam("target_cell", LongType, Some("4096")),
          inParam("train_sample", LongType, Some("262144")),
          inParam("iterations", IntegerType, Some("2")),
          inParam("pq", BooleanType, Some("true")),
          inParam("sq8", BooleanType, Some("false")))) {
          override def call(input: InternalRow) = {
            val src = tableByName(input.getString(0))
            val idxRoot = pathByName(input.getString(1)).toString
            val tc = if (input.isNullAt(2)) 4096L else input.getLong(2)
            val ts = if (input.isNullAt(3)) 262144L else input.getLong(3)
            val it = if (input.isNullAt(4)) 2 else input.getInt(4)
            val pq = input.isNullAt(5) || input.getBoolean(5)
            val sq8 = !input.isNullAt(6) && input.getBoolean(6)
            val schema = src.tableSchema.getOrElse(
              TxLogV2Table(spark, src.root, input.getString(0)).schema)
            require(Seq("vec_id", "embedding").forall(
              schema.fieldNames.contains),
              "ann_build_auto corpus needs (vec_id, embedding) columns")
            val (pinned, k) = graft.operators.AnnIndex.buildAuto(
              spark, src.root, idxRoot, schema, it, tc, ts, pq, sq8)
            resultScan(StructType(Seq(
              StructField("pinned_version", IntegerType),
              StructField("k", IntegerType))),
              Seq(InternalRow(pinned, k)))
          }
        }
      case "ann_search" =>
        // CALL c.system.ann_search('ns.idx', query_vec_id [, k
        // [, predicate [, require_fresh [, nprobe]]]]): IVF top-k
        // through the persisted index without leaving SQL. The optional
        // predicate — a SQL boolean over the corpus's own columns —
        // restricts candidates INSIDE the probed cells (pre-filter: all
        // k survivors satisfy it); nprobe widens routing to the n best
        // cells (the recall/cost knob). Result is at most k rows, so
        // the driver-side collect is bounded by the ask, never the
        // corpus.
        // variant => 'sq8' ranks the persisted 8-bit codes instead of the
        // full vectors (4x less ranking I/O, near-exact recall; the
        // index must have been built with sq8 artifacts). The sq8 path
        // serves unfiltered — its ranking payload carries no corpus
        // attributes; use the exact variant for predicate search.
        new MaintenanceProc("ann_search", Seq(
          inParam("index", StringType),
          inParam("query_vec_id", LongType),
          inParam("k", IntegerType, Some("5")),
          inParam("predicate", StringType, Some("NULL")),
          inParam("require_fresh", BooleanType, Some("false")),
          inParam("nprobe", IntegerType, Some("1")),
          inParam("variant", StringType, Some("'exact'")))) {
          override def call(input: InternalRow) = {
            val idxRoot = pathByName(input.getString(0)).toString
            require(!input.isNullAt(1), "ann_search needs query_vec_id")
            val qid = input.getLong(1)
            val k = if (input.isNullAt(2)) 5 else input.getInt(2)
            require(k > 0, s"ann_search k must be positive, got $k")
            val pred =
              if (input.isNullAt(3)) None
              else Some(org.apache.spark.sql.functions
                .expr(input.getString(3)))
            val fresh = !input.isNullAt(4) && input.getBoolean(4)
            val np = if (input.isNullAt(5)) 1 else input.getInt(5)
            val variant =
              if (input.isNullAt(6)) "exact" else input.getString(6)
            val rows = variant match {
              case "exact" => graft.operators.AnnIndex.searchIvf(spark,
                idxRoot, qid, k, requireFresh = fresh, filter = pred,
                nprobe = np).collect()
              case "sq8" =>
                require(pred.isEmpty,
                  "ann_search variant 'sq8' serves unfiltered — use " +
                    "the exact variant for predicate search")
                graft.operators.AnnIndex.searchIvfSq8(spark, idxRoot,
                  qid, k, requireFresh = fresh, nprobe = np).collect()
              case other => throw new IllegalArgumentException(
                s"ann_search variant must be 'exact' or 'sq8': $other")
            }
            resultScan(StructType(Seq(
              StructField("vec_id", LongType),
              StructField("cluster", IntegerType),
              StructField("q_cos", DoubleType))),
              rows.toSeq.map(r =>
                InternalRow(r.getLong(0), r.getInt(1), r.getDouble(2))))
          }
        }
      case "ann_search_batch" =>
        // CALL c.system.ann_search_batch('ns.idx', array(id, ...)
        // [, k [, nprobe [, require_fresh]]]): N queries through ONE
        // persisted-index pass (AnnIndex.searchIvfBatch — routing is
        // the broadcast k × N centroid product, scoring an equi-join
        // on the probed cell, per-query window top-k). At most k rows
        // PER QUERY cross the driver — bounded by the ask, never the
        // corpus; the nightly-similarity-sweep shape without leaving
        // SQL.
        new MaintenanceProc("ann_search_batch", Seq(
          inParam("index", StringType),
          inParam("query_vec_ids",
            org.apache.spark.sql.types.ArrayType(LongType)),
          inParam("k", IntegerType, Some("5")),
          inParam("nprobe", IntegerType, Some("1")),
          inParam("require_fresh", BooleanType, Some("false")),
          inParam("variant", StringType, Some("'exact'")))) {
          override def call(input: InternalRow) = {
            val idxRoot = pathByName(input.getString(0)).toString
            require(!input.isNullAt(1),
              "ann_search_batch needs query_vec_ids")
            val qids = input.getArray(1).toLongArray().toSeq
            require(qids.nonEmpty, "ann_search_batch needs query ids")
            val k = if (input.isNullAt(2)) 5 else input.getInt(2)
            require(k > 0, s"ann_search_batch k must be positive, got $k")
            val np = if (input.isNullAt(3)) 1 else input.getInt(3)
            val fresh = !input.isNullAt(4) && input.getBoolean(4)
            val variant = if (input.isNullAt(5)) "exact"
              else input.getString(5)
            // 'sq8' ranks the persisted 8-bit codes (4× less ranking
            // I/O, near-exact recall — the index needs sq8 artifacts)
            val (df, scoreCol) = variant match {
              case "exact" => (graft.operators.AnnIndex.searchIvfBatch(
                spark, idxRoot, qids, k, requireFresh = fresh,
                nprobe = np), "q_cos")
              case "sq8" => (graft.operators.AnnIndex.searchIvfSq8Batch(
                spark, idxRoot, qids, k, requireFresh = fresh,
                nprobe = np), "sq8_sim")
              case other => throw new IllegalArgumentException(
                s"ann_search_batch variant must be exact|sq8, got $other")
            }
            val rows = df.collect()
            resultScan(StructType(Seq(
              StructField("q_id", LongType),
              StructField("vec_id", LongType),
              StructField("cluster", IntegerType),
              StructField(scoreCol, DoubleType))),
              rows.toSeq.map(r => InternalRow(r.getLong(0), r.getLong(1),
                r.getInt(2), r.getDouble(3))))
          }
        }
      case "ann_refresh" =>
        // CALL c.system.ann_refresh('ns.idx' [, max_routed_frac]):
        // advance a persisted index to its corpus head WITHOUT a
        // training pass — new vectors route to the existing centroids,
        // PQ codes encode against the persisted codebook, the pin
        // advances. O(new vectors); the between-rebuilds growth path
        // (AnnIndex.refresh's contract, tombstoned corpora refuse
        // loudly). The STALENESS GUARD (AnnIndex.refreshAuto) is ON BY
        // DEFAULT at the conf policy spark.graft.ann.maxRoutedFrac
        // (0.5): when absorbing the window would push the
        // routed-since-train fraction past the threshold, the refresh
        // retrains instead — recall decay from frozen centroids is
        // bounded by policy, not operator vigilance. An explicit
        // max_routed_frac overrides; ≤ 0 disables the guard.
        // action ∈ noop|routed|retrained.
        new MaintenanceProc("ann_refresh", Seq(
          inParam("index", StringType),
          inParam("max_routed_frac", DoubleType, Some("NULL")))) {
          override def call(input: InternalRow) = {
            val idxRoot = pathByName(input.getString(0)).toString
            // omitted → the conf-resolved policy default (0.5): the
            // guard is ON unless the caller explicitly passes ≤ 0
            val frac =
              if (input.isNullAt(1))
                graft.operators.AnnIndex.confMaxRoutedFrac(spark)
              else input.getDouble(1)
            val (v, added, action) =
              if (frac > 0)
                graft.operators.AnnIndex.refreshAuto(spark, idxRoot, frac)
              else {
                val (v0, a0) =
                  graft.operators.AnnIndex.refresh(spark, idxRoot)
                (v0, a0, if (a0 == 0) "noop" else "routed")
              }
            resultScan(StructType(Seq(
              StructField("pinned_version", IntegerType),
              StructField("vectors_added", LongType),
              StructField("action", StringType))),
              Seq(InternalRow(v, added,
                org.apache.spark.unsafe.types.UTF8String
                  .fromString(action))))
          }
        }
      case "ann_status" =>
        // CALL c.system.ann_status('ns.idx'): the index's drift ledger —
        // routed-since-train fraction (recall-decay proxy: vectors
        // routed to centroids trained on an older distribution) and
        // cell-size imbalance (a quantizer that stopped fitting the
        // data concentrates mass in few cells). O(index) — one meta
        // read + one |cells|-sized aggregate; never scans the corpus.
        new MaintenanceProc("ann_status", Seq(
          inParam("index", StringType))) {
          override def call(input: InternalRow) = {
            val idxRoot = pathByName(input.getString(0)).toString
            val st = graft.operators.AnnIndex.status(spark, idxRoot)
            resultScan(StructType(Seq(
              StructField("pinned_version", IntegerType),
              StructField("corpus_version", IntegerType),
              StructField("total_vectors", LongType),
              StructField("routed_since_train", LongType),
              StructField("routed_frac", DoubleType),
              StructField("cells", LongType),
              StructField("mean_cell", DoubleType),
              StructField("max_cell", LongType),
              StructField("imbalance", DoubleType))),
              Seq(InternalRow(st.pinnedVersion, st.corpusVersion,
                st.totalVectors, st.routedSinceTrain, st.routedFrac,
                st.cells, st.meanCell, st.maxCell, st.imbalance)))
          }
        }
      case "semdedup" =>
        // CALL c.system.semdedup('ns.src', 'ns.dst', tau [, k]): the SQL
        // surface of graft.operators.SemDedup — cluster-blocked semantic
        // dedup over the source's (vec_id, embedding) columns, verdicts
        // (vec_id, cluster, kept) materialized as a fresh txlog table.
        // k = 0 (default) derives k from the corpus (the scale path);
        // an explicit k pins it (deterministic replay). The SQL-first
        // user of the 100 TB catalog never has to leave SQL to curate.
        new MaintenanceProc("semdedup", Seq(
          inParam("source", StringType),
          inParam("dest", StringType),
          inParam("tau", DoubleType),
          inParam("k", IntegerType, Some("0")))) {
          override def call(input: InternalRow) = {
            implicit val s: SparkSession = spark
            val src = tableByName(input.getString(0))
            require(!input.isNullAt(2), "semdedup needs tau")
            val tau = input.getDouble(2)
            val k = if (input.isNullAt(3)) 0 else input.getInt(3)
            val schema = src.tableSchema.getOrElse(
              TxLogV2Table(spark, src.root, input.getString(0)).schema)
            require(Seq("vec_id", "embedding").forall(
              schema.fieldNames.contains),
              "semdedup source needs (vec_id, embedding) columns")
            val emb = src.snapshot(schema)
            val verdicts =
              if (k > 0) graft.operators.SemDedup.withK(emb, k, tau)
              else graft.operators.SemDedup(emb, tau)
            val outV = writeResultTable(input.getString(1), verdicts)
            resultScan(StructType(Seq(
              StructField("dest_version", IntegerType),
              StructField("n_vectors", LongType))),
              Seq(InternalRow(outV, tableByName(input.getString(1))
                .entries(None).flatMap(_.stats.get(TxLogTable.RowsKey))
                .map(_._1).sum)))
          }
        }
      case "dedup_near" =>
        // CALL c.system.dedup_near('ns.src', 'ns.dst' [, threshold]):
        // the SQL surface of graft.operators.Dedup.dedupNearExact —
        // MinHash-LSH-gated near-dup removal over the source's
        // (doc_id, source, text) columns, surviving corpus materialized
        // as a fresh txlog table. Same scale shape as the operator:
        // banding + candidate verify + one anti-join, never all-pairs.
        new MaintenanceProc("dedup_near", Seq(
          inParam("source", StringType),
          inParam("dest", StringType),
          inParam("threshold", DoubleType, Some("0.5")))) {
          override def call(input: InternalRow) = {
            val src = tableByName(input.getString(0))
            val thr = if (input.isNullAt(2)) 0.5 else input.getDouble(2)
            val schema = src.tableSchema.getOrElse(
              TxLogV2Table(spark, src.root, input.getString(0)).schema)
            require(Seq("doc_id", "source", "text").forall(
              schema.fieldNames.contains),
              "dedup_near source needs (doc_id, source, text) columns")
            val docs = src.snapshot(schema)
            // cache hygiene: the banding the operator caches for its
            // two in-query consumers is one-shot here — the handle the
            // operator returns is released after materializing (finally:
            // an existing-dest refusal must not leak it either), so a
            // long-lived session never accumulates corpus-sized cache
            // entries across procedure calls
            val (kept, bands) = graft.operators.Dedup
              .dedupNearExactWithHandle(docs, thr)
            val outV =
              try writeResultTable(input.getString(1), kept)
              finally bands.unpersist()
            resultScan(StructType(Seq(
              StructField("dest_version", IntegerType),
              StructField("n_kept", LongType))),
              Seq(InternalRow(outV, tableByName(input.getString(1))
                .entries(None).flatMap(_.stats.get(TxLogTable.RowsKey))
                .map(_._1).sum)))
          }
        }
      case "changes" =>
        // CALL c.system.changes('ns.src', 'ns.dst', from_v [, to_v
        // [, with_deletes]]): the BATCH change feed in pure SQL — rows
        // added in (from_v, to_v] (to_v NULL = latest), tagged
        // _commit_version, materialized as a fresh txlog table;
        // with_deletes additionally surfaces MOR tombstones as
        // keys-only '_change_type = delete' rows (changesWithDeletes).
        // Row-preserving maintenance versions are skipped (the same
        // contract the streaming source defaults to). The SQL-only
        // consumer reads a day's delta of a 100 TB table without ever
        // importing this library.
        // Timestamp twins (from_ts / to_ts — epoch millis or a Timestamp
        // literal) resolve against commit instants with the same AT-OR-
        // AFTER / at-or-before contract as the streaming options: the
        // feed covers every commit landing within [from_ts, to_ts].
        // "yesterday's delta" without ever looking a version number up.
        new MaintenanceProc("changes", Seq(
          inParam("source", StringType),
          inParam("dest", StringType),
          inParam("from_v", IntegerType, Some("NULL")),
          inParam("to_v", IntegerType, Some("NULL")),
          inParam("with_deletes", BooleanType, Some("false")),
          inParam("from_ts", StringType, Some("NULL")),
          inParam("to_ts", StringType, Some("NULL")))) {
          override def call(input: InternalRow) = {
            val src = tableByName(input.getString(0))
            require(input.isNullAt(2) != input.isNullAt(5),
              "changes needs exactly one of from_v / from_ts")
            require(input.isNullAt(3) || input.isNullAt(6),
              "to_v and to_ts are mutually exclusive")
            def millisOf(s: String): Long = s.toLongOption.getOrElse(
              java.sql.Timestamp.valueOf(s).getTime)
            lazy val hist = src.history()
            val fromV =
              if (!input.isNullAt(2)) input.getInt(2)
              else {
                val m = millisOf(input.getString(5))
                // first commit AT-OR-AFTER from_ts enters the feed;
                // a ts past all history yields an empty window
                hist.find(_.commitMillis.exists(_ >= m))
                  .map(_.version - 1)
                  .getOrElse(src.latestVersion.getOrElse(0))
              }
            val toV =
              if (!input.isNullAt(3)) input.getInt(3)
              else if (!input.isNullAt(6)) {
                val m = millisOf(input.getString(6))
                // last commit at-or-before to_ts closes the window;
                // a ts before all history yields an empty window
                hist.reverse.find(_.commitMillis.exists(_ <= m))
                  .map(_.version).getOrElse(fromV)
              }
              else src.latestVersion.getOrElse(fromV)
            val withDel = !input.isNullAt(4) && input.getBoolean(4)
            val schema = src.tableSchema.getOrElse(
              TxLogV2Table(spark, src.root, input.getString(0)).schema)
            val feed =
              if (withDel) src.changesWithDeletes(schema, fromV, toV,
                skipRewrites = true)
              else src.changesBetween(schema, fromV, toV,
                skipRewrites = true)
            val outV = writeResultTable(input.getString(1), feed)
            resultScan(StructType(Seq(
              StructField("dest_version", IntegerType),
              StructField("from_v", IntegerType),
              StructField("to_v", IntegerType))),
              Seq(InternalRow(outV, fromV, toV)))
          }
        }
      case "detail" =>
        // CALL c.system.detail('ns.t'): DESCRIBE DETAIL — one row of the
        // table's physical identity straight off the manifest (no file
        // opened, free at any size): current version, file/row/byte
        // totals, the partition layout, bucket spec(s), sort order, and
        // bloom columns. The first thing an operator asks of an
        // unfamiliar 100 TB table.
        new MaintenanceProc("detail", Seq(
          inParam("table", StringType))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            val v = t.latestVersion.get
            val sizes = t.fileSizes(Some(v))
            // metaRowCount handles every exactness case (pre-stats
            // files, tombstones decline, DV masks subtract exactly)
            val exactRows =
              t.metaRowCount(Some(v)).map(Long.box).orNull
            def s(str: String) = UTF8String.fromString(str)
            resultScan(StructType(Seq(
              StructField("version", IntegerType),
              StructField("n_files", IntegerType),
              StructField("n_rows", LongType),
              StructField("bytes", LongType),
              StructField("partition_cols", StringType),
              StructField("bucket_spec", StringType),
              StructField("sort_cols", StringType),
              StructField("bloom_cols", StringType),
              StructField("ndv", StringType),
              StructField("cursors", StringType),
              StructField("optimize_write", BooleanType))),
              Seq(InternalRow(v, sizes.size, exactRows,
                Long.box(sizes.map(_._2).sum),
                s(t.partitionColsOf(v).mkString(",")),
                s((t.bucketSpecsOf(v).map { case (k, n) =>
                    s"bucket($n, $k)" } ++
                  t.timeSpecsOf(v).map { case (k, u) => s"${u}s($k)" })
                  .mkString(", ")),
                s(t.sortColsOf(v).mkString(",")),
                s(t.bloomColsOf(v).mkString(",")),
                s(t.ndvOf(v).toSeq.sortBy(_._1)
                  .map { case (c, n) => s"$c≈$n" }.mkString(", ")),
                // who pins vacuum, at which version — the retention
                // question DESCRIBE DETAIL should answer in one glance
                s(t.cursors().values.toSeq.sortBy(_.name)
                  .map(c => s"${c.name}@v${c.version}").mkString(", ")),
                t.optimizeWriteOf(v))))
          }
        }
      case "resort" =>
        // CALL c.system.resort('ns.t' [, target_bytes]): re-arm a sorted
        // table's ordering report by rewriting ONLY the partition dirs
        // whose file ranges overlap — O(damaged), never O(table); armed
        // dirs are carried by reference and a fully-armed table is a
        // no-op. The targeted twin of `compact` for the sorted layout.
        new MaintenanceProc("resort", Seq(
          inParam("table", StringType),
          inParam("target_bytes", LongType, Some(
            graft.sources.TxLogTable.RebucketTargetBytes.toString)))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            val tgtB = if (input.isNullAt(1))
              graft.sources.TxLogTable.RebucketTargetBytes
              else input.getLong(1)
            val schema = t.tableSchema.getOrElse(
              TxLogV2Table(spark, t.root, input.getString(0)).schema)
            val stats = t.resort(schema, tgtB)
            resultScan(StructType(Seq(
              StructField("version", IntegerType),
              StructField("rewritten", IntegerType),
              StructField("carried", IntegerType))),
              Seq(InternalRow(stats.version, stats.rewritten,
                stats.carried)))
          }
        }
      case "analyze" =>
        // CALL c.system.analyze('ns.t', 'col1,col2'): (re)build the
        // column NDV sketches from the current masked snapshot — stats
        // for tables created without 'ndvCols', and the re-tightening
        // pass after deletes left the incremental fold stale-high. One
        // column-pruned scan per column, metadata-only commit, no
        // change-feed impact.
        new MaintenanceProc("analyze", Seq(
          inParam("table", StringType),
          inParam("cols", StringType))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            require(!input.isNullAt(1), "analyze needs a column list")
            val cols = input.getString(1).split(",").toSeq
              .map(_.trim).filter(_.nonEmpty)
            val schema = t.tableSchema.getOrElse(
              TxLogV2Table(spark, t.root, input.getString(0)).schema)
            val v = t.analyze(schema, cols)
            def s(str: String) = UTF8String.fromString(str)
            resultScan(StructType(Seq(
              StructField("version", IntegerType),
              StructField("ndv", StringType))),
              Seq(InternalRow(v,
                s(t.ndvOf(v).toSeq.sortBy(_._1)
                  .map { case (c, n) => s"$c≈$n" }.mkString(", ")))))
          }
        }
      case "optimize" =>
        // CALL c.system.optimize('ns.t' [, min_bytes [, target_bytes]]):
        // INCREMENTAL small-file compaction — only files under min_bytes
        // rewrite (packed toward target_bytes outputs), everything
        // already large is carried by manifest reference. This is what
        // OPTIMIZE means at 100 TB: steady-state cost O(new small
        // files), never O(table) — `compact` (the full rewrite) stays
        // for layout resets. Reads through the MOR mask, so optimizing
        // also materializes deletes for the rewritten files.
        new MaintenanceProc("optimize", Seq(
          inParam("table", StringType),
          inParam("min_bytes", LongType, Some((16L * 1024 * 1024).toString)),
          inParam("target_bytes", LongType,
            Some((128L * 1024 * 1024).toString)))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            val minB = if (input.isNullAt(1)) 16L * 1024 * 1024
              else input.getLong(1)
            val tgtB = if (input.isNullAt(2)) 128L * 1024 * 1024
              else input.getLong(2)
            val schema = t.tableSchema.getOrElse(
              TxLogV2Table(spark, t.root, input.getString(0)).schema)
            val stats = t.compactSmall(schema, minB, tgtB)
            resultScan(StructType(Seq(
              StructField("version", IntegerType),
              StructField("rewritten", IntegerType),
              StructField("carried", IntegerType))),
              Seq(InternalRow(stats.version, stats.rewritten,
                stats.carried)))
          }
        }
      case "create_mv" =>
        // CALL c.system.create_mv('ns.mv', 'ns.src', 'k1,k2',
        // 'total:value[,out2:src2]'): persist an incrementally-
        // maintained materialized view (GROUP BY group_cols with
        // COUNT(*) AS mv_count and SUM(src) AS out per spec) as a
        // catalog table. The view registers a change-feed cursor on the
        // source so vacuum can never drop its un-consumed window; see
        // graft.operators.MaterializedView for the refresh contract.
        new MaintenanceProc("create_mv", Seq(
          inParam("view", StringType),
          inParam("source", StringType),
          inParam("group_cols", StringType),
          inParam("sums", StringType),
          inParam("filter", StringType, Some("NULL")),
          inParam("derives", StringType, Some("NULL")))) {
          override def call(input: InternalRow) = {
            val qname = input.getString(0)
            val parts = qname.split('.')
            require(parts.length >= 2 && parts.forall(_.nonEmpty),
              s"create_mv view must be 'ns.table', got '$qname'")
            val vident = Identifier.of(parts.init, parts.last)
            require(!tableExists(vident),
              s"MV destination already exists: $qname")
            val src = tableByName(input.getString(1))
            val srcSchema = src.tableSchema.getOrElse(
              TxLogV2Table(spark, src.root, input.getString(1)).schema)
            val groups = input.getString(2).split(',').toSeq
              .map(_.trim).filter(_.nonEmpty)
            val (sums, mins, maxs) = parseAggSpec(input.getString(3))
            val filt = if (input.isNullAt(4)) None
              else Some(input.getString(4))
            // 'name:expr[;name2:expr2]' — row-local computed columns
            // (date_trunc rollup keys and the like); ';'-separated so
            // the exprs may contain commas
            val derives = if (input.isNullAt(5)) Nil
              else input.getString(5).split(';').toSeq.map(_.trim)
                .filter(_.nonEmpty).map { t =>
                  val i = t.indexOf(':')
                  require(i > 0, s"derive spec must be name:expr, got $t")
                  t.substring(0, i).trim -> t.substring(i + 1).trim
                }
            val v = graft.operators.MaterializedView.create(spark,
              pathOf(vident).toString, qname, src, srcSchema, groups,
              sums, filt, mins, maxs, derives)
            resultScan(StructType(Seq(
              StructField("version", IntegerType),
              StructField("source_version", IntegerType))),
              Seq(InternalRow(v, src.latestVersion.getOrElse(-1))))
          }
        }
      case "create_mv_joined" =>
        // CALL c.system.create_mv_joined('ns.mv', 'ns.fact',
        // 'ns.dim[;ns.dim2…]', 'fk:dk[,fk2:dk2][;fk:dk…]', 'group_cols',
        // 'out:src[,..]' [, filter [, derives]]): a STAR-SCHEMA view —
        // fact JOIN dim1 [JOIN dim2 …] (each inner, broadcast; each dim
        // unique on its keys) grouped and summed, group/sum/filter
        // columns from any side; 'derives' (name:expr, ';'-separated)
        // are row-local computed columns that may
        // combine all sides. An N-DIM star lists its dims
        // ';'-separated, join_on aligning positionally (','-separated
        // keys within a dim). Every dim is PINNED independently: fact
        // deltas fold against the pinned snapshots, and each dim
        // change folds as its own DIM DELTA (changed keys → affected
        // groups, telescoped across dims) that re-pins — never
        // O(view).
        new MaintenanceProc("create_mv_joined", Seq(
          inParam("view", StringType),
          inParam("fact", StringType),
          inParam("dim", StringType),
          inParam("join_on", StringType),
          inParam("group_cols", StringType),
          inParam("sums", StringType),
          inParam("filter", StringType, Some("NULL")),
          inParam("derives", StringType, Some("NULL")))) {
          override def call(input: InternalRow) = {
            val qname = input.getString(0)
            val parts = qname.split('.')
            require(parts.length >= 2 && parts.forall(_.nonEmpty),
              s"create_mv_joined view must be 'ns.table', got '$qname'")
            val vident = Identifier.of(parts.init, parts.last)
            require(!tableExists(vident),
              s"MV destination already exists: $qname")
            val fact = tableByName(input.getString(1))
            val factSchema = fact.tableSchema.getOrElse(
              TxLogV2Table(spark, fact.root, input.getString(1)).schema)
            val dimNames = input.getString(2).split(';').toSeq
              .map(_.trim).filter(_.nonEmpty)
            val joinSegs = input.getString(3).split(';').toSeq
              .map(_.trim).filter(_.nonEmpty)
            require(dimNames.nonEmpty && joinSegs.length == dimNames.length,
              s"join_on must carry one ';'-segment per dim: " +
                s"${dimNames.length} dims, ${joinSegs.length} segments")
            def pairs(sv: String, what: String): Seq[(String, String)] =
              sv.split(',').toSeq.map(_.trim).filter(_.nonEmpty).map { t =>
                val i = t.indexOf(':')
                require(i > 0, s"$what must be 'a:b', got '$t'")
                t.substring(0, i) -> t.substring(i + 1)
              }
            val dimSpecs = dimNames.zip(joinSegs).map { case (dn, js) =>
              val dim = tableByName(dn)
              val dimSchema = dim.tableSchema.getOrElse(
                TxLogV2Table(spark, dim.root, dn).schema)
              (dim, dimSchema, pairs(js, "join_on"))
            }
            val groups = input.getString(4).split(',').toSeq
              .map(_.trim).filter(_.nonEmpty)
            val filt = if (input.isNullAt(6)) None
              else Some(input.getString(6))
            val derives = if (input.isNullAt(7)) Nil
              else input.getString(7).split(';').toSeq.map(_.trim)
                .filter(_.nonEmpty).map { t =>
                  val i = t.indexOf(':')
                  require(i > 0, s"derive spec must be name:expr, got $t")
                  t.substring(0, i).trim -> t.substring(i + 1).trim
                }
            val (sums, mins, maxs) = parseAggSpec(input.getString(5))
            val v = graft.operators.MaterializedView.createStar(spark,
              pathOf(vident).toString, qname, fact, factSchema,
              dimSpecs, groups, sums, filt, mins, maxs, derives)
            resultScan(StructType(Seq(
              StructField("version", IntegerType),
              StructField("fact_version", IntegerType),
              StructField("dim_version", IntegerType))),
              Seq(InternalRow(v, fact.latestVersion.getOrElse(-1),
                dimSpecs.head._1.latestVersion.getOrElse(-1))))
          }
        }
      case "refresh_mv" =>
        // CALL c.system.refresh_mv('ns.mv' [, full]): one transactional
        // refresh — O(changed groups) incremental fold of the source's
        // change feed, or a full recompute when the range crosses a
        // reset (or full => true). No-op when already current; progress
        // (#mvsrc) and data ride one atomic commit (exactly-once).
        new MaintenanceProc("refresh_mv", Seq(
          inParam("view", StringType),
          inParam("full", org.apache.spark.sql.types.BooleanType,
            Some("false")))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            val full = !input.isNullAt(1) && input.getBoolean(1)
            val st = graft.operators.MaterializedView.refresh(spark,
              t.root, full)
            resultScan(StructType(Seq(
              StructField("mode", StringType),
              StructField("from_version", IntegerType),
              StructField("to_version", IntegerType),
              StructField("groups_changed", LongType),
              StructField("mv_version", IntegerType))),
              Seq(InternalRow(UTF8String.fromString(st.mode),
                st.fromVersion, st.toVersion, st.groupsChanged,
                st.mvVersion)))
          }
        }
      case "mv_status" =>
        // CALL c.system.mv_status('ns.mv'): the view's maintenance
        // position — consumed source version vs source head, how many
        // versions behind, the definition, and (star views) the pinned
        // dim version vs the dim head — without touching data.
        new MaintenanceProc("mv_status", Seq(
          inParam("view", StringType))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            val d = graft.operators.MaterializedView.definition(spark,
              t.root)
            val src = TxLogTable(spark, d.source)
            val last = graft.operators.MaterializedView
              .lastSourceVersion(t)
            val head = src.latestVersion.getOrElse(-1)
            val dimTs = d.dims.map(dm => TxLogTable(spark, dm.root))
            val dimPinneds = d.dims.indices.map(i =>
              graft.operators.MaterializedView.lastDimVersion(t, i))
            val dimHeads = dimTs.map(_.latestVersion.getOrElse(-1))
            // the N-dim star reports one ';'-joined cell per column:
            // roots, pins, heads; dim_behind is the WORST lag (the
            // number a maintenance scheduler acts on)
            val dimPinned = dimPinneds.headOption
            val dimHead = dimHeads.headOption
            resultScan(StructType(Seq(
              StructField("name", StringType),
              StructField("consumed_version", IntegerType),
              StructField("source_head", IntegerType),
              StructField("behind", IntegerType),
              StructField("group_cols", StringType),
              StructField("sums", StringType),
              StructField("filter", StringType),
              StructField("derives", StringType),
              StructField("dim", StringType),
              StructField("dim_pinned", IntegerType),
              StructField("dim_head", IntegerType),
              StructField("dim_behind", IntegerType))),
              Seq(InternalRow(UTF8String.fromString(d.name), last, head,
                math.max(0, head - last),
                UTF8String.fromString(d.groupCols.mkString(",")),
                UTF8String.fromString(
                  (d.sums.map { case (o, c) => s"$o:$c" } ++
                    d.mins.map { case (o, c) => s"$o:min:$c" } ++
                    d.maxs.map { case (o, c) => s"$o:max:$c" })
                    .mkString(",")),
                d.filterExpr.map(UTF8String.fromString).orNull,
                if (d.derives.isEmpty) null
                else UTF8String.fromString(d.derives
                  .map { case (n, _, e) => s"$n:$e" }.mkString(";")),
                (if (d.dims.isEmpty) null
                 else UTF8String.fromString(
                   d.dims.map(_.root).mkString(";"))),
                dimPinned.map(Integer.valueOf).orNull,
                dimHead.map(Integer.valueOf).orNull,
                (if (d.dims.isEmpty) null
                 else Integer.valueOf(dimPinneds.zip(dimHeads)
                   .map { case (p, h) => math.max(0, h - p) }.max)))))
          }
        }
      case "mvs" =>
        // CALL c.system.mvs('ns'): every materialized view in the
        // namespace with its maintenance position — the fleet dashboard
        // (which views exist, what they watch, how far behind). One
        // directory listing + one manifest-meta read per view; no data
        // touched.
        new MaintenanceProc("mvs", Seq(
          inParam("namespace", StringType))) {
          override def call(input: InternalRow) = {
            val ns = input.getString(0).split('.').filter(_.nonEmpty)
            val rows = listTables(ns).toSeq.flatMap { ident =>
              val root = pathOf(ident).toString
              if (!java.nio.file.Files.exists(
                  java.nio.file.Paths.get(root, "_log", "mv.def"))) Nil
              else {
                // one broken view (vacuumed-away #mvsrc, half-created
                // mv.def, missing source) must not take down the fleet
                // dashboard: flag it with consumed_version = -1 instead
                scala.util.Try {
                  val d = graft.operators.MaterializedView
                    .definition(spark, root)
                  val src = TxLogTable(spark, d.source)
                  val last = graft.operators.MaterializedView
                    .lastSourceVersion(TxLogTable(spark, root))
                  val head = src.latestVersion.getOrElse(-1)
                  InternalRow(
                    UTF8String.fromString(
                      (ns :+ ident.name).mkString(".")),
                    UTF8String.fromString(d.name), last, head,
                    math.max(0, head - last))
                }.getOrElse(InternalRow(
                  UTF8String.fromString((ns :+ ident.name).mkString(".")),
                  UTF8String.fromString(ident.name), -1, -1, 0)) :: Nil
              }
            }
            resultScan(StructType(Seq(
              StructField("table", StringType),
              StructField("name", StringType),
              StructField("consumed_version", IntegerType),
              StructField("source_head", IntegerType),
              StructField("behind", IntegerType))), rows)
          }
        }
      case "create_mv_distinct" =>
        // CALL c.system.create_mv_distinct('ns.mv', 'ns.src', 'k1,k2',
        // 'out:src' [, filter]): an APPROX-COUNT(DISTINCT) view — the
        // per-group HLL register table of src, maintained by the same
        // incremental fold as every MV (appends fold, deleting windows
        // recompute: the honest sketch contract). Read estimates with
        // CALL system.mv_distinct.
        new MaintenanceProc("create_mv_distinct", Seq(
          inParam("view", StringType),
          inParam("source", StringType),
          inParam("group_cols", StringType),
          inParam("measure", StringType),
          inParam("filter", StringType, Some("NULL")))) {
          override def call(input: InternalRow) = {
            val qname = input.getString(0)
            val parts = qname.split('.')
            require(parts.length >= 2 && parts.forall(_.nonEmpty),
              s"create_mv_distinct view must be 'ns.table', got '$qname'")
            val vident = Identifier.of(parts.init, parts.last)
            require(!tableExists(vident),
              s"MV destination already exists: $qname")
            val src = tableByName(input.getString(1))
            val srcSchema = src.tableSchema.getOrElse(
              TxLogV2Table(spark, src.root, input.getString(1)).schema)
            val groups = input.getString(2).split(',').toSeq
              .map(_.trim).filter(_.nonEmpty)
            val m = input.getString(3)
            val i = m.indexOf(':')
            require(i > 0, s"measure must be out:src, got $m")
            val filt = if (input.isNullAt(4)) None
              else Some(input.getString(4))
            val v = graft.operators.MaterializedView.createDistinct(
              spark, pathOf(vident).toString, qname, src, srcSchema,
              groups, m.substring(0, i).trim -> m.substring(i + 1).trim,
              filt)
            resultScan(StructType(Seq(
              StructField("version", IntegerType),
              StructField("source_version", IntegerType))),
              Seq(InternalRow(v, src.latestVersion.getOrElse(-1))))
          }
        }
      case "create_mv_hist" =>
        // CALL c.system.create_mv_hist('ns.mv', 'ns.src', 'k1,k2',
        // 'out:src' [, filter]): a power-of-2 HISTOGRAM view (bucket =
        // bit length of floor(src), exact counts) — fully additive, so
        // it folds incrementally under every DML shape. Read quantile
        // estimates with CALL system.mv_quantile.
        new MaintenanceProc("create_mv_hist", Seq(
          inParam("view", StringType),
          inParam("source", StringType),
          inParam("group_cols", StringType),
          inParam("measure", StringType),
          inParam("filter", StringType, Some("NULL")))) {
          override def call(input: InternalRow) = {
            val qname = input.getString(0)
            val parts = qname.split('.')
            require(parts.length >= 2 && parts.forall(_.nonEmpty),
              s"create_mv_hist view must be 'ns.table', got '$qname'")
            val vident = Identifier.of(parts.init, parts.last)
            require(!tableExists(vident),
              s"MV destination already exists: $qname")
            val src = tableByName(input.getString(1))
            val srcSchema = src.tableSchema.getOrElse(
              TxLogV2Table(spark, src.root, input.getString(1)).schema)
            val groups = input.getString(2).split(',').toSeq
              .map(_.trim).filter(_.nonEmpty)
            val m = input.getString(3)
            val i = m.indexOf(':')
            require(i > 0, s"measure must be out:src, got $m")
            val filt = if (input.isNullAt(4)) None
              else Some(input.getString(4))
            val v = graft.operators.MaterializedView.createHist(
              spark, pathOf(vident).toString, qname, src, srcSchema,
              groups, m.substring(0, i).trim -> m.substring(i + 1).trim,
              filt)
            resultScan(StructType(Seq(
              StructField("version", IntegerType),
              StructField("source_version", IntegerType))),
              Seq(InternalRow(v, src.latestVersion.getOrElse(-1))))
          }
        }
      case "refresh_all" =>
        // CALL c.system.refresh_all('ns'): one maintenance sweep over
        // every materialized view in the namespace — each stale view
        // gets one transactional refresh (the per-view cost contract is
        // refresh_mv's: O(changed groups)); current views no-op; a
        // broken view is reported as mode='error' without stopping the
        // fleet. Views are refreshed in DEPENDENCY ORDER (a view whose
        // source is itself a view in the sweep runs after it — the
        // exact-distinct pairs and any MV-over-MV chain come out fully
        // current in ONE sweep). The cron body of a 100-view deployment.
        new MaintenanceProc("refresh_all", Seq(
          inParam("namespace", StringType))) {
          override def call(input: InternalRow) = {
            val ns = input.getString(0).split('.').filter(_.nonEmpty)
            val views: Seq[(String, String, Seq[String])] =
              listTables(ns).toSeq.flatMap { ident =>
                val root = pathOf(ident).toString
                if (!java.nio.file.Files.exists(
                    java.nio.file.Paths.get(root, "_log", "mv.def"))) Nil
                else {
                  val qn = (ns :+ ident.name).mkString(".")
                  // a view depends on its SOURCE and (star views) its
                  // DIM — both must refresh first when they are views
                  // themselves, or the sweep would fold against a
                  // stale upstream and need a second pass
                  val deps = scala.util.Try {
                    val d = graft.operators.MaterializedView
                      .definition(spark, root)
                    d.source +: d.dims.map(_.root)
                  }.getOrElse(Nil)
                  Seq((qn, root, deps))
                }
              }
            // Kahn order on the view→view source/dim edges; anything
            // left (a cycle can only mean corrupted defs) appends
            // unordered and will surface as error rows, not be dropped
            val byRoot = views.map(v => v._2 -> v).toMap
            val ordered = scala.collection.mutable.ArrayBuffer
              .empty[(String, String, Seq[String])]
            var remaining = views
            var progressed = true
            while (remaining.nonEmpty && progressed) {
              val (ready, blocked) = remaining.partition(v =>
                !v._3.exists(s => byRoot.contains(s) &&
                  !ordered.exists(_._2 == s)))
              progressed = ready.nonEmpty
              ordered ++= ready
              remaining = blocked
            }
            ordered ++= remaining
            val rows = ordered.toSeq.map { case (qn, root, _) =>
              scala.util.Try {
                val st = graft.operators.MaterializedView
                  .refresh(spark, root)
                InternalRow(UTF8String.fromString(qn),
                  UTF8String.fromString(st.mode), st.fromVersion,
                  st.toVersion, st.groupsChanged, st.mvVersion)
              }.recover { case e =>
                InternalRow(UTF8String.fromString(qn),
                  UTF8String.fromString(
                    s"error: ${e.getMessage.take(120)}"),
                  -1, -1, -1L, -1)
              }.get
            }
            resultScan(StructType(Seq(
              StructField("table", StringType),
              StructField("mode", StringType),
              StructField("from_version", IntegerType),
              StructField("to_version", IntegerType),
              StructField("groups_changed", LongType),
              StructField("view_version", IntegerType))), rows)
          }
        }
      case "create_mv_distinct_exact" =>
        // CALL c.system.create_mv_distinct_exact('ns.mv', 'ns.src',
        // 'k1,k2', 'u' [, filter]): EXACT incremental COUNT(DISTINCT u)
        // — two composed views (inner keyed by (groups, u) count-only at
        // '<mv>_keys'; outer counts the inner's rows), both fully
        // additive, so distinct counts stay exact AND incremental under
        // every DML shape including deletes. Refresh inner-then-outer
        // (refresh_all orders the pair automatically). Read the count as
        // the outer view's mv_count.
        new MaintenanceProc("create_mv_distinct_exact", Seq(
          inParam("view", StringType),
          inParam("source", StringType),
          inParam("group_cols", StringType),
          inParam("distinct_col", StringType),
          inParam("filter", StringType, Some("NULL")))) {
          override def call(input: InternalRow) = {
            val qname = input.getString(0)
            val parts = qname.split('.')
            require(parts.length >= 2 && parts.forall(_.nonEmpty),
              s"create_mv_distinct_exact view must be 'ns.table', " +
                s"got '$qname'")
            val vident = Identifier.of(parts.init, parts.last)
            require(!tableExists(vident),
              s"MV destination already exists: $qname")
            val src = tableByName(input.getString(1))
            val srcSchema = src.tableSchema.getOrElse(
              TxLogV2Table(spark, src.root, input.getString(1)).schema)
            val groups = input.getString(2).split(',').toSeq
              .map(_.trim).filter(_.nonEmpty)
            val filt = if (input.isNullAt(4)) None
              else Some(input.getString(4))
            val (v1, v2) = graft.operators.MaterializedView
              .createDistinctExact(spark, pathOf(vident).toString, qname,
                src, srcSchema, groups, input.getString(3).trim, filt)
            resultScan(StructType(Seq(
              StructField("keys_version", IntegerType),
              StructField("view_version", IntegerType),
              StructField("source_version", IntegerType))),
              Seq(InternalRow(v1, v2, src.latestVersion.getOrElse(-1))))
          }
        }
      case "mv_branch" =>
        // CALL c.system.mv_branch('ns.mv', 'name'): fork a CONSISTENT
        // (source, view) branch pair for write-audit-publish on derived
        // tables — audit writes go to source.branch_<name>, CALL
        // refresh_mv('ns.mv.branch_<name>') folds them on the branch,
        // CALL mv_publish promotes both. The view must be current.
        new MaintenanceProc("mv_branch", Seq(
          inParam("view", StringType),
          inParam("name", StringType))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            val (f, v) = graft.operators.MaterializedView.branchMv(
              spark, t.root, input.getString(1))
            resultScan(StructType(Seq(
              StructField("source_fork_version", IntegerType),
              StructField("view_fork_version", IntegerType))),
              Seq(InternalRow(f, v)))
          }
        }
      case "mv_publish" =>
        // CALL c.system.mv_publish('ns.mv', 'name'): publish the audited
        // branch pair — fact first, then the view with its consumed
        // version rewritten to the fact's just-published MAIN version.
        // Gated on the branch view having absorbed the branch fact head.
        new MaintenanceProc("mv_publish", Seq(
          inParam("view", StringType),
          inParam("name", StringType))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            val (f, v) = graft.operators.MaterializedView.publishWap(
              spark, t.root, input.getString(1))
            resultScan(StructType(Seq(
              StructField("source_version", IntegerType),
              StructField("view_version", IntegerType))),
              Seq(InternalRow(f, v)))
          }
        }
      case "mv_distinct" =>
        // CALL c.system.mv_distinct('ns.mv'): per-group distinct-count
        // estimates from a create_mv_distinct view's registers — a
        // |groups|-sized aggregate over the ≤256 register rows each.
        new MaintenanceProc("mv_distinct", Seq(
          inParam("view", StringType))) {
          override def call(input: InternalRow) =
            dfScan(graft.operators.MaterializedView.distinctEstimates(
              spark, tableByName(input.getString(0)).root))
        }
      case "mv_quantile" =>
        // CALL c.system.mv_quantile('ns.mv', q): per-group quantile
        // estimates (±1 power of 2) from a create_mv_hist view.
        new MaintenanceProc("mv_quantile", Seq(
          inParam("view", StringType),
          inParam("q", DoubleType))) {
          override def call(input: InternalRow) =
            dfScan(graft.operators.MaterializedView.histQuantiles(
              spark, tableByName(input.getString(0)).root,
              input.getDouble(1)))
        }
      case "remove_orphans" =>
        // CALL c.system.remove_orphans('ns.t' [, min_age_ms
        // [, dry_run]]): delete data-dir files no reachable version
        // references — crashed writers' leftovers — WITHOUT touching
        // history (vacuum with keep = ALL versions). Same writer guards
        // as vacuum: `.staging` scratch dirs are skipped and only files
        // older than min_age_ms go (a just-staged file whose manifest
        // publish is in flight must survive). The orphan sweep is the
        // maintenance companion Iceberg ships as remove_orphan_files.
        new MaintenanceProc("remove_orphans", Seq(
          inParam("table", StringType),
          inParam("min_age_ms", LongType,
            Some(TxLogTable.DefaultVacuumMinAgeMillis.toString)),
          inParam("dry_run", org.apache.spark.sql.types.BooleanType,
            Some("false")))) {
          override def call(input: InternalRow) = {
            val t = tableByName(input.getString(0))
            val age = if (input.isNullAt(1))
              TxLogTable.DefaultVacuumMinAgeMillis else input.getLong(1)
            val dry = !input.isNullAt(2) && input.getBoolean(2)
            val (_, files) = t.vacuum(keep = Int.MaxValue,
              minAgeMillis = age, retainMillis = 0L, dryRun = dry)
            resultScan(StructType(Seq(
              StructField("files_deleted", IntegerType))),
              Seq(InternalRow(files)))
          }
        }
      case "bm25" =>
        // CALL c.system.bm25('ns.docs', 'space-separated terms' [, k]):
        // BM25-ranked top-k retrieval over a documents table — the SQL
        // surface of TextQueries.bm25Scores (same body: query-term-
        // filtered postings, broadcast df/stats, DECIMAL-deterministic
        // scores). Returns (doc_id, n_terms, bm25) ordered by score
        // desc, doc_id asc. k is a bounded result-set size (top-k is
        // driver-small by definition), capped so the LocalScan result
        // can never balloon.
        new MaintenanceProc("bm25", Seq(
          inParam("table", StringType),
          inParam("query", StringType),
          inParam("k", IntegerType, Some("10")))) {
          override def call(input: InternalRow) = {
            val src = tableByName(input.getString(0))
            require(!input.isNullAt(1), "bm25 needs a query string")
            val terms = input.getString(1).split("\\s+").toSeq
              .filter(_.nonEmpty).distinct
            val k = if (input.isNullAt(2)) 10 else input.getInt(2)
            require(k > 0 && k <= 10000,
              s"bm25 k must be in [1, 10000], got $k")
            val schema = src.tableSchema.getOrElse(
              TxLogV2Table(spark, src.root, input.getString(0)).schema)
            require(Seq("doc_id", "text").forall(
              schema.fieldNames.contains),
              "bm25 source needs (doc_id, text) columns")
            import org.apache.spark.sql.functions.col
            // one-shot scoring: release the per-doc cache the scorer
            // registers once the top-k is materialized (a repeated CALL
            // builds a fresh snapshot plan per table version — without
            // the release each call would leave a corpus-sized entry)
            val (scores, perDoc) = graft.queries.TextQueries
              .bm25ScoresWithHandle(src.snapshot(schema), terms)
            val top =
              try scores.orderBy(col("bm25").desc, col("doc_id"))
                .limit(k).collect()
              finally perDoc.unpersist()
            resultScan(StructType(Seq(
              StructField("doc_id", LongType),
              StructField("n_terms", LongType),
              StructField("bm25", DoubleType))),
              top.toSeq.map(r => InternalRow(
                r.getLong(0), r.getLong(1), r.getDouble(2))))
          }
        }
      case other =>
        throw new UnsupportedOperationException(
          s"unknown txlog procedure: system.$other " +
            "(available: compact, vacuum, history, partitions, restore, " +
            "clone, zorder, rebucket, semdedup, dedup_near, bm25, " +
            "optimize, detail, analyze, resort, changes, ann_build, " +
            "ann_refresh, ann_search, ann_status, cursors, " +
            "release_cursor, delete_pos, update_pos, set_time_unit, " +
            "tag, drop_tag, tags, ann_search_batch)")
    }
  }

  // materialize a procedure's result frame as a fresh catalog table:
  // declared-schema create + one append commit (the dest must not exist —
  // curation outputs are new artifacts, not in-place mutations)
  private def writeResultTable(dest: String,
                               df: org.apache.spark.sql.DataFrame): Int = {
    val parts = dest.split('.')
    require(parts.length >= 2 && parts.forall(_.nonEmpty),
      s"destination must be 'ns.table', got '$dest'")
    val dident = Identifier.of(parts.init, parts.last)
    require(!tableExists(dident), s"destination already exists: $dest")
    val t = TxLogTable(spark, pathOf(dident).toString)
    t.create(df.schema)
    t.commit(df, overwrite = false)
  }
}

/** The catalog's V2 `bucket` function — the contract behind bucketed
  * storage-partitioned joins. Spark resolves a scan-reported
  * `bucket(n, key)` transform by loading THIS function from the table's
  * catalog and binding it against `(numBuckets INT, key)`; two sides whose
  * bound functions share a `canonicalName` (and bucket count) are
  * key-grouped-compatible, and with the V2 bucketed-shuffle conf Spark
  * evaluates [[bind]]'s `produceResult` to align a non-bucketed side.
  * `produceResult` is bit-identical to the write path's derivation
  * (`pmod(xxhash64(key), n)`, seed 42 — the builtin's seed), so planner
  * grouping and physical layout can never disagree.
  */
object TxLogBucketFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.types._

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(numBuckets, cols...): txlog bucket id = " +
      "pmod(xxhash64(cols...), n)"

  override def bind(inputType: StructType)
      : org.apache.spark.sql.connector.catalog.functions.BoundFunction = {
    require(inputType.fields.length >= 2 &&
      inputType.fields(0).dataType == IntegerType,
      s"bucket expects (numBuckets INT, keys...), got " +
        inputType.catalogString)
    val keyTypes = inputType.fields.drop(1).map(_.dataType).toIndexedSeq
    keyTypes.foreach {
      case LongType | IntegerType | ShortType | ByteType | StringType |
           DateType | TimestampType | TimestampNTZType => ()
      case other => throw new UnsupportedOperationException(
        s"txlog bucket key type unsupported: ${other.catalogString}")
    }
    new org.apache.spark.sql.connector.catalog.functions
        .ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] =
        (IntegerType +: keyTypes).toArray
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String =
        s"graft.txlog.bucket(${keyTypes.map(_.catalogString)
          .mkString(",")})"
      override def isResultNullable: Boolean = false
      override def produceResult(
          input: org.apache.spark.sql.catalyst.InternalRow): Integer = {
        val n = input.getInt(0)
        // seed-chained over the key tuple, exactly the builtin xxhash64's
        // multi-child evaluation; a null key leaves the seed untouched
        // (so the write path lands nulls where the planner expects them)
        var h = 42L
        var i = 0
        while (i < keyTypes.length) {
          if (!input.isNullAt(i + 1))
            h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
              .hash(input.get(i + 1, keyTypes(i)), keyTypes(i), h)
          i += 1
        }
        (((h % n) + n) % n).toInt
      }
    }
  }
}

/** A catalog table: declared (or inferred) logical schema, identity
  * partitioning, batch read + batch write. Reads prefer the injected
  * [[TxLogReadRule]] (codegen path); [[newScanBuilder]] is the
  * no-extensions fallback.
  */
final case class TxLogV2Table(spark: SparkSession, root: String,
                              ident: String,
                              asOfVersion: Option[Int] = None) extends Table
    with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  /** `DELETE FROM t WHERE ...` — routed to the file-targeted COW delete.
    * The SQL contract requires EXACT deletion of the matching rows, so
    * the statement is accepted only when every pushed filter translates
    * completely ([[exactPredicate]] — unlike scan pruning, which may
    * translate conservatively because Spark re-filters rows, here the
    * translation IS the executed predicate). `TxLogTable.deleteWhere`
    * then re-applies the full predicate to the files it rewrites, and
    * manifest pruning bounds the rewrite exactly as for the API path.
    */
  override def canDeleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    filters.forall(f => TxLogV2Table.exactPredicate(f).isDefined)

  override def deleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    val pred = filters.toSeq.flatMap(TxLogV2Table.exactPredicate)
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    table.deleteWhere(schema, pred)
  }

  /** `UPDATE` / `MERGE INTO` (and DELETE with an untranslatable
    * predicate) via the GROUP-BASED row-level rewrite: Spark reads the
    * table through the operation's scan, computes the complete post-
    * operation content of the groups it read, and hands it to the write
    * side — with no runtime group filtering reported, the read groups are
    * the whole snapshot, so the write is one atomic OVERWRITE commit of
    * the new table state. Semantically exact for every command; write
    * amplification is O(table) — the documented COW worst case. The
    * file-targeted paths ([[graft.sources.TxLogTable.merge]],
    * `deleteWhere`, `replaceWhere`) remain the scale surface for keyed
    * workloads; SQL DELETE with translatable predicates also keeps its
    * targeted route through [[canDeleteWhere]] above, which Spark
    * consults FIRST.
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    () => new org.apache.spark.sql.connector.write.RowLevelOperation {
      override def command
          : org.apache.spark.sql.connector.write.RowLevelOperation.Command =
        info.command

      // the data files the operation scan chose to read — exactly the
      // GROUPS the write must replace (None until the scan is built) —
      // plus the snapshot version and pruning condition the scan saw, so
      // the publish can detect concurrent ADDS that the rewrite never
      // considered (write-skew guard in commitStagedReplace)
      @volatile private var readRels: Option[Set[String]] = None
      @volatile private var scanBaseV: Option[Int] = None
      @volatile private var scanPredC: Option[Column] = None
      private[v2] def replacedRels: Option[Set[String]] = readRels

      // The rewrite plans this scan as a genuine BatchScan (the V1Scan
      // special case does not apply to operation scans), so delegate to
      // Spark's own ParquetScan — vectorized and columnar — over the FILE
      // SUBSET the manifest says may hold matching rows. The pushed
      // condition is consumed ONLY for manifest file pruning and is
      // reported fully handled, never forwarded to the parquet reader: a
      // group scan must return EVERY row of each surviving file (carried
      // rows ride the rewrite untouched), so row-group-level filtering
      // would silently drop them.
      //
      // HIVE-PARTITIONED tables: the file index gets basePath, so the
      // `k=v` segments between data/ and each pruned leaf are parsed back
      // into partition columns (typed by the declared schema) — the same
      // reconstruction readRels does for API reads.
      //
      // COLUMN-MAPPED tables: files carry PHYSICAL column names, so the
      // parquet scan is built against the physical schema and then
      // wrapped in a Scan that re-labels readSchema() to LOGICAL names:
      // Spark matches the scan relation's attributes to the table's BY
      // NAME, while the rows themselves are consumed POSITIONALLY — a
      // rename changes neither position nor type, so re-naming the
      // schema is the entire translation.
      //
      // LIVE MOR TOMBSTONES: raw parquet cannot apply the mask, so the
      // scan is wrapped in [[MorMaskedScan]] — the sequence-aware
      // tombstone filter — and returns only surviving rows; the commit
      // carries the tombstone lines so unreplaced files stay masked.
      override def newScanBuilder(options: CaseInsensitiveStringMap)
          : ScanBuilder = {
        val t = TxLogV2Table.this.table
        new ScanBuilder with SupportsPushDownFilters {
          private var pushed: Array[Filter] = Array.empty
          override def pushFilters(fs: Array[Filter]): Array[Filter] = {
            pushed = fs
            Array.empty // fully handled: groups are pruned, rows are not
          }
          override def pushedFilters(): Array[Filter] = pushed
          override def build(): Scan = {
            // Live positional-delete masks: the group scan is raw
            // parquet and would resurrect masked rows into the rewrite.
            // Unlike the (bounded, key-shaped) MOR tombstone mask there
            // is no per-row key to check — masking needs file positions
            // the delegate reader does not expose — so the statement
            // asks for a compaction, which folds every mask away.
            require(t.latestVersion.forall(t.dvsOf(_).isEmpty),
              "SQL row-level DML on a table with live positional-delete " +
                "masks (deletion vectors): compact the table first")
            val pred = pushed.toSeq
              .flatMap(f => graft.sources.v2.TxLogV2Table.loosePredicate(f))
              .reduceOption(_ && _)
            val rels = pred match {
              case Some(p) => t.candidateFilesWhere(p).toSet
              case None => t.entries(None).map(_.rel).toSet
            }
            readRels = Some(rels)
            scanBaseV = t.latestVersion
            scanPredC = pred
            val cmap = t.latestVersion.map(t.colMapOf).getOrElse(Map.empty)
            val physFull = StructType(schema.fields.map(f =>
              f.copy(name = cmap.getOrElse(f.name, f.name))))
            val dataDir = java.nio.file.Paths.get(
              graft.sources.TxLogTable.pathOfRoot(root), "data").toString
            val paths = rels.toSeq.sorted.map(r =>
              new org.apache.hadoop.fs.Path(s"$dataDir/$r"))
            val index = new org.apache.spark.sql.execution.datasources
              .InMemoryFileIndex(spark, paths, Map("basePath" -> dataDir),
                Some(physFull))
            // prune to EXACTLY the declared columns: identity layouts keep
            // their partition columns (they're in the schema); a bucketed
            // layout's hidden _bkt dir column is discovered by the index
            // but must NOT surface — the relation has no such attribute
            // (the staging write re-derives it)
            val innerBuilder = org.apache.spark.sql.execution.datasources
              .v2.parquet.ParquetScanBuilder(spark, index, physFull,
                physFull, CaseInsensitiveStringMap.empty())
            innerBuilder.pruneColumns(physFull)
            val inner = innerBuilder.build()
            // Live MOR tombstones: wrap with the sequence-aware mask so
            // only surviving rows ride the rewrite. Key columns are never
            // renamed while tombstones are live (deleteByKeysMor refuses
            // mapped keys), so physical = logical for exactly the columns
            // the mask reads — colmap on OTHER columns composes fine.
            val tombs = t.latestVersion.map(t.tombstonesOf).getOrElse(Nil)
            val morKeys = t.latestVersion.map(t.morKeysOf).getOrElse(Nil)
            val masked: Scan =
              if (tombs.isEmpty || morKeys.isEmpty) inner
              else {
                val rs = inner.readSchema()
                val keyOrds = morKeys.map(rs.fieldIndex).toArray
                val keyTypes = keyOrds.map(rs(_).dataType)
                // Array[Byte] has identity equality — a binary key would
                // make the map lookup silently miss, masking nothing
                require(!keyTypes.exists(
                  _ == org.apache.spark.sql.types.BinaryType),
                  "SQL row-level DML with binary MOR keys: compact first")
                val convs = keyTypes.map(org.apache.spark.sql.catalyst
                  .CatalystTypeConverters.createToCatalystConverter)
                val keyCols = morKeys.map(k => org.apache.spark.sql
                  .functions.col("`" + k.replace("`", "``") + "`"))
                // Bound the driver BEFORE materializing, in ONE pass:
                // each tombstone file's keys are collected through
                // limit(remaining + 1), so at most cap+1 keys ever reach
                // the driver IN TOTAL (the limit stops the scan early on
                // the file that crosses), every file is read exactly
                // once, and a table with 100M live tombstone keys gets
                // the friendly "compact first" refusal instead of the
                // OOM the cap exists to prevent.
                val morCap = TxLogV2Table.maxMorMaskKeys(spark)
                var remaining = morCap
                var overCap = false
                val pairsB = Seq.newBuilder[(Seq[Any], Int)]
                val tombIt = tombs.iterator
                while (tombIt.hasNext && !overCap) {
                  val (rel, tv) = tombIt.next()
                  val rows = spark.read.parquet(s"$dataDir/$rel")
                    .select(keyCols: _*).na.drop("any", morKeys)
                    .limit(remaining + 1).collect()
                  if (rows.length > remaining) overCap = true
                  else {
                    remaining -= rows.length
                    rows.foreach(r => pairsB +=
                      ((Seq.tabulate[Any](morKeys.length)(i =>
                        convs(i)(r.get(i))), tv)))
                  }
                }
                require(!overCap,
                  s"SQL row-level DML with more than $morCap live MOR " +
                    s"tombstone keys (cap $morCap): compact first")
                // the key map — provably under the cap, same order of
                // memory as the broadcast anti-join the API read path uses
                val pairs = pairsB.result()
                new MorMaskedScan(spark, inner, index, dataDir,
                  t.addedVersions(None), keyOrds, keyTypes,
                  pairs.groupMapReduce(_._1)(_._2)(math.max))
              }
            if (cmap.isEmpty) masked
            else new Scan {
              private val logicalOf = cmap.map(_.swap)
              override def readSchema(): StructType = StructType(
                masked.readSchema().fields.map(f =>
                  f.copy(name = logicalOf.getOrElse(f.name, f.name))))
              override def toBatch = masked.toBatch
              override def description(): String = masked.description()
              override def columnarSupportMode() =
                masked.columnarSupportMode()
              override def supportedCustomMetrics() =
                masked.supportedCustomMetrics()
              override def reportDriverMetrics() =
                masked.reportDriverMetrics()
            }
          }
        }
      }
      // The write side must also be a genuine BatchWrite: delegate the
      // file writing to Spark's own parquet v2 writer aimed at a txlog
      // staging directory, then publish the staged files in
      // BatchWrite.commit as ONE atomic group-replacement version —
      // staged files plus every unread file carried by reference — with
      // stats and blooms harvested as for any commit.
      override def newWriteBuilder(winfo: LogicalWriteInfo): WriteBuilder =
        new WriteBuilder {
          override def build(): Write =
            new org.apache.spark.sql.connector.write.Write {
              private val scratch = java.nio.file.Paths.get(
                graft.sources.TxLogTable.pathOfRoot(root), "data",
                "rowlevel-" + java.util.UUID.randomUUID() + ".staging")
              // Data files always carry PHYSICAL column names (the
              // table-wide column-mapping contract): the delegate writer
              // takes its parquet schema from LogicalWriteInfo, and rows
              // are positional, so presenting the physically-renamed
              // schema is the entire logical→physical translation.
              private val physInfo: LogicalWriteInfo = {
                val cmap = TxLogV2Table.this.table.latestVersion
                  .map(TxLogV2Table.this.table.colMapOf)
                  .getOrElse(Map.empty)
                if (cmap.isEmpty) winfo
                else new LogicalWriteInfo {
                  override def options() = winfo.options()
                  override def queryId() = winfo.queryId()
                  override def schema() = StructType(
                    winfo.schema().fields.map(f =>
                      f.copy(name = cmap.getOrElse(f.name, f.name))))
                  override def rowIdSchema() = winfo.rowIdSchema()
                  override def metadataSchema() = winfo.metadataSchema()
                }
              }
              private val delegate =
                org.apache.spark.sql.execution.datasources.v2.parquet
                  .ParquetWrite(Seq(scratch.toString), "parquet",
                    (_: org.apache.spark.sql.types.DataType) => true,
                    physInfo)
              override def toBatch
                  : org.apache.spark.sql.connector.write.BatchWrite =
                new org.apache.spark.sql.connector.write.BatchWrite {
                  private val inner = delegate.toBatch
                  // Spark's group-based rewrite prepends a
                  // `__row_operation` marker to every row and, when the
                  // operation declares no metadata columns, hands the
                  // UNPROJECTED row to the writer (the projecting task
                  // only engages with a metadata projection) — so the
                  // factory wraps each writer with the data projection
                  // the marker layout implies. Rows already matching the
                  // write schema pass through untouched.
                  override def createBatchWriterFactory(
                      pinfo: org.apache.spark.sql.connector.write
                        .PhysicalWriteInfo) = {
                    val f = inner.createBatchWriterFactory(pinfo)
                    val n = physInfo.schema().length
                    val writeSchema = physInfo.schema()
                    new org.apache.spark.sql.connector.write.DataWriterFactory {
                      override def createWriter(partitionId: Int,
                          taskId: Long) = {
                        val w = f.createWriter(partitionId, taskId)
                        new org.apache.spark.sql.connector.write.DataWriter[
                            org.apache.spark.sql.catalyst.InternalRow] {
                          private val proj =
                            org.apache.spark.sql.catalyst.ProjectingInternalRow(
                              writeSchema, (1 to n).toIndexedSeq)
                          override def write(
                              r: org.apache.spark.sql.catalyst.InternalRow)
                              : Unit =
                            if (r.numFields == n) w.write(r)
                            else {
                              // the only layout the projection is sound
                              // for is [marker, data...]; anything else
                              // would silently shift column values
                              require(r.numFields == n + 1,
                                s"row-level write expected $n data fields" +
                                  s" (+1 marker), got ${r.numFields}")
                              proj.project(r); w.write(proj)
                            }
                          override def commit() = w.commit()
                          override def abort() = w.abort()
                          override def close() = w.close()
                        }
                      }
                    }
                  }
                  override def commit(
                      messages: Array[org.apache.spark.sql.connector.write
                        .WriterCommitMessage]): Unit = {
                    inner.commit(messages)
                    // replace exactly the groups the scan read; files the
                    // manifest pruning skipped are carried by reference —
                    // file-targeted SQL UPDATE/MERGE, like the API paths
                    val t = TxLogV2Table.this.table
                    val opName = "row-level-" + info.command.toString
                      .toLowerCase(java.util.Locale.ROOT)
                    val partCols = t.latestVersion.map(t.partitionColsOf)
                      .getOrElse(Nil)
                    if (partCols.isEmpty)
                      t.commitStagedReplace(scratch, replacedRels,
                        op = opName,
                        scanBase = scanBaseV, scanPred = scanPredC)
                    else {
                      // HIVE-PARTITIONED table: the delegate staged FLAT
                      // files (partition values still inline as data
                      // columns, physical names). Read them back, relabel
                      // to logical, and re-stage through the partition-
                      // aware commit — one extra pass over the REPLACED
                      // subset only; the untouched bulk is carried by
                      // manifest reference, never read.
                      val physSchema = physInfo.schema()
                      val logicalNames = winfo.schema().fieldNames
                      val raw = spark.read.schema(physSchema)
                        .parquet(scratch.toString)
                      val logical = raw.select(
                        physSchema.fieldNames.toIndexedSeq.zip(logicalNames)
                          .map { case (p, l) =>
                            org.apache.spark.sql.functions
                              .col("`" + p.replace("`", "``") + "`").as(l)
                          }: _*)
                      try {
                        t.commitReplacingDf(logical, replacedRels,
                          op = opName,
                          scanBase = scanBaseV, scanPred = scanPredC)
                      } finally TxLogV2Table.dropDir(scratch)
                    }
                  }
                  override def abort(
                      messages: Array[org.apache.spark.sql.connector.write
                        .WriterCommitMessage]): Unit = {
                    inner.abort(messages)
                    // delete the scratch dir outright: vacuum deliberately
                    // PROTECTS .staging paths (in-flight writers), so an
                    // aborted write must clean up after itself or leak
                    TxLogV2Table.dropDir(scratch)
                  }
                  override def useCommitCoordinator: Boolean =
                    inner.useCommitCoordinator
                }
            }
        }
    }

  def table: TxLogTable = TxLogTable(spark, root)

  override def name(): String = ident

  override lazy val schema: StructType =
    asOfVersion.flatMap(table.schemaOf)
      .orElse(table.tableSchema)
      .getOrElse(
        TxLogRelation(spark.sqlContext, root, asOfVersion, None).schema)

  // declared within-file sort order of the version being read
  private[v2] def sortCols: Seq[String] =
    asOfVersion.orElse(table.latestVersion)
      .map(table.sortColsOf).getOrElse(Nil)

  // bucket levels of the version being read (empty = not bucketed),
  // keyed by their hidden partition column name
  private[v2] def bucketSpecs: Map[String, (String, Int)] =
    asOfVersion.orElse(table.latestVersion)
      .map(table.bucketSpecsOf).getOrElse(Nil).zipWithIndex
      .map { case (kn, i) =>
        graft.sources.TxLogTable.bucketColAt(i) -> kn }.toMap

  // hidden time levels of the version being read, keyed by their hidden
  // partition column name → (source column, unit)
  private[v2] def timeSpecs: Map[String, (String, String)] =
    asOfVersion.orElse(table.latestVersion)
      .map(table.timeSpecsOf).getOrElse(Nil).zipWithIndex
      .map { case (ku, i) =>
        graft.sources.TxLogTable.timeColAt(i) -> ku }.toMap

  private[v2] def timeTransform(src: String, unit: String): Transform =
    unit match {
      case "year" => Expressions.years(src)
      case "month" => Expressions.months(src)
      case "day" => Expressions.days(src)
      case "hour" => Expressions.hours(src)
    }

  override def partitioning(): Array[Transform] = {
    val cols = asOfVersion.orElse(table.latestVersion)
      .map(table.partitionColsOf).getOrElse(Nil)
    val specs = bucketSpecs
    val times = timeSpecs
    cols.map { c =>
      (specs.get(c), times.get(c)) match {
        case (Some((k, n)), _) => Expressions.bucket(n, k): Transform
        case (_, Some((src, u))) => timeTransform(src, u)
        case _ => Expressions.identity(c): Transform
      }
    }.toArray
  }

  /** Spark refuses a table that declares V1_BATCH_WRITE and hands back a
    * non-V1 Write (and vice versa), so the capability must agree with
    * what [[TxLogWriteBuilder.build]] will choose: native DSv2 batch
    * write for unpartitioned tables, the V1 `partitionBy` staging pass
    * for hive-partitioned ones.
    */
  override def capabilities(): util.Set[TableCapability] = {
    // optimizeWrite tables declare the V1 capability even unpartitioned:
    // build() routes them to the V1 staging write (the rebalance owner),
    // and Spark picks the V1 exec only for tables that declare it
    val partitioned = asOfVersion.orElse(table.latestVersion)
      .exists(v => table.partitionColsOf(v).nonEmpty ||
        table.optimizeWriteOf(v))
    if (partitioned)
      util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
        TableCapability.OVERWRITE_BY_FILTER)
    else
      util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
        TableCapability.OVERWRITE_BY_FILTER)
  }

  /** Storage-partitioned-join eligibility: hive-partitioned, no live MOR
    * tombstones (raw parquet cannot apply the mask), no column mapping
    * (the SPJ scan reads physical = logical), and the SPJ conf ON. Under
    * exactly this condition [[TxLogReadRule]] leaves the relation alone
    * and [[TxLogScanBuilder.build]] returns a [[TxLogSpjScan]] that
    * reports [[org.apache.spark.sql.connector.read.partitioning
    * .KeyGroupedPartitioning]] — a join of two tables partitioned on the
    * same key then plans with zero shuffle exchanges. In every other
    * state the splice to the native parquet plan wins (it handles masks
    * and relabels, but cannot report partitioning).
    */
  private[v2] def spjEligible: Boolean =
    spark.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.V2_BUCKETING_ENABLED) && {
      val v = asOfVersion.orElse(table.latestVersion)
      // timeUnitsMixed: after a spec evolution (days→hours) and before
      // the converging compaction, the SPJ report would key-group
      // same-instant rows under different dir values — decline; the
      // splice path (with per-file-unit pruning) serves instead
      v.exists(ver => table.partitionColsOf(ver).nonEmpty &&
        table.tombstonesOf(ver).isEmpty && table.dvsOf(ver).isEmpty &&
        table.colMapOf(ver).isEmpty && !table.timeUnitsMixed(ver))
    }

  /** The (possibly time-traveled) snapshot as a DataFrame — what
    * [[TxLogReadRule]] splices into the logical plan (native parquet
    * scan, logical columns).
    */
  def snapshotDF(pred: Option[Column]): DataFrame = pred match {
    case Some(p) => table.snapshotWhere(schema, p, asOfVersion)
    case None => table.snapshot(schema, asOfVersion)
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new TxLogScanBuilder(this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new TxLogWriteBuilder(this, info)
}

object TxLogV2Table {
  import org.apache.spark.sql.functions.lit
  import org.apache.spark.sql.sources._

  /** Cap on live MOR tombstone keys the row-level-DML mask collects to
    * the driver (≈ tens of MB at the cap — the broadcast anti-join of
    * the API read path holds the same set). Beyond it the statement asks
    * for a compaction, which folds the tombstones away entirely. The
    * cap is enforced by an executor-side count BEFORE any driver
    * materialization, so the refusal itself never risks the OOM it
    * guards against. Conf-overridable for ops tuning (and so the spec
    * can exercise the refusal without 4M real keys).
    */
  val MaxMorMaskKeys: Int = 4 << 20

  def maxMorMaskKeys(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.getOption("spark.graft.sql.maxMorMaskKeys")
      .map(_.toInt).getOrElse(MaxMorMaskKeys)

  // best-effort recursive delete of a staging scratch dir (abort/cleanup)
  private[v2] def dropDir(dir: java.nio.file.Path): Unit =
    if (java.nio.file.Files.isDirectory(dir))
      scala.util.Using.resource(java.nio.file.Files.walk(dir)) { s =>
        s.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala
          .foreach(p =>
            scala.util.Try(java.nio.file.Files.deleteIfExists(p)))
      }

  /** CONSERVATIVE Filter → Column translation for GROUP pruning: a
    * partially translated conjunction prunes fewer files, never wrong
    * rows (the full condition logic lives inside the rewritten query).
    */
  // A legal column name containing a dot would parse as struct access
  // through col(name); quote it so the translated predicate resolves the
  // literal column (backticks doubled per the quoting grammar).
  private def qcol(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  private[v2] def loosePredicate(f: Filter): Option[Column] = f match {
    case And(l, r) =>
      (loosePredicate(l), loosePredicate(r)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (a, b) => a.orElse(b) // one conjunct still prunes soundly
      }
    case other => exactPredicate(other)
  }

  /** EXACT source-Filter → Column translation for DELETE FROM: every
    * shape must translate or the statement is refused — a partial
    * translation here would delete the wrong rows (contrast with scan
    * pruning, where partial is sound because rows are re-filtered).
    */
  private[v2] def exactPredicate(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(qcol(a) === lit(v))
    case EqualNullSafe(a, v) => Some(qcol(a) <=> lit(v))
    case GreaterThan(a, v) => Some(qcol(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(qcol(a) >= lit(v))
    case LessThan(a, v) => Some(qcol(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(qcol(a) <= lit(v))
    case In(a, vs) if vs.nonEmpty => Some(qcol(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(qcol(a).isNull)
    case IsNotNull(a) => Some(qcol(a).isNotNull)
    case StringStartsWith(a, v) => Some(qcol(a).startsWith(v))
    case StringEndsWith(a, v) => Some(qcol(a).endsWith(v))
    case StringContains(a, v) => Some(qcol(a).contains(v))
    case And(l, r) =>
      for (a <- exactPredicate(l); b <- exactPredicate(r)) yield a && b
    case Or(l, r) =>
      for (a <- exactPredicate(l); b <- exactPredicate(r)) yield a || b
    case Not(c) => exactPredicate(c).map(!_)
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}

/** Fallback scan (sessions without the extension rule): pushes projection
  * and filters into manifest pruning via the same translation as the V1
  * connector, then surfaces rows through [[V1Scan]]. Pays the V1 row
  * conversion — the extension path exists precisely to avoid it.
  */
final class TxLogScanBuilder(tbl: TxLogV2Table) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = tbl.schema
  private var filters: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(fs: Array[Filter]): Array[Filter] = {
    filters = fs
    fs // all filters re-applied by Spark: pruning only ever skips files
  }

  override def pushedFilters(): Array[Filter] = filters

  /** SPJ-eligible reads get the key-grouped parquet batch scan (the
    * read-rule splice is skipped under the same condition); everything
    * else keeps the V1 fallback, which the splice replaces anyway.
    */
  override def build(): Scan =
    if (tbl.spjEligible)
      new TxLogSpjScan(tbl.spark, tbl, required, filters)
    else v1Fallback

  private def v1Fallback: Scan = new V1Scan {
    override def readSchema(): StructType = required

    override def toV1TableScan[T <: BaseRelation with TableScan](
        ctx: SQLContext): T = {
      val rel = TxLogRelation(ctx, tbl.root, tbl.asOfVersion, Some(tbl.schema))
      val req = required
      val fs = filters
      new BaseRelation with TableScan {
        override def sqlContext: SQLContext = ctx
        override def schema: StructType = req
        override def buildScan(): RDD[Row] =
          rel.buildScan(req.fieldNames, fs)
      }.asInstanceOf[T]
    }
  }
}

/** INSERT INTO / INSERT OVERWRITE via the commit protocol: append commit,
  * or overwrite commit when Spark requests truncation. The write side
  * reuses the V1 DataFrame path ([[V1Write]]) — writes stage through
  * `df.write.parquet` either way, so there is no codegen tax to avoid.
  */
final class TxLogWriteBuilder(tbl: TxLogV2Table, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate
    with org.apache.spark.sql.connector.write.SupportsOverwrite {

  private var overwrite = false
  // predicate-scoped overwrite (`INSERT OVERWRITE t PARTITION (p=3)`,
  // `df.writeTo(t).overwrite(cond)`): routed to [[TxLogTable.replaceWhere]]
  private var replacePred: Option[Column] = None

  override def truncate(): WriteBuilder = { overwrite = true; this }

  /** Static partition overwrite / overwrite-by-condition. Every filter
    * must translate EXACTLY — a partially-translated condition would
    * replace the wrong rows (same contract as SQL DELETE) — and
    * `replaceWhere` additionally validates that every incoming row
    * satisfies the condition, so a bad static INSERT OVERWRITE fails
    * loudly instead of leaking rows into foreign partitions.
    */
  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    import org.apache.spark.sql.sources.AlwaysTrue
    if (filters.isEmpty || filters.forall(_ == AlwaysTrue())) {
      overwrite = true
    } else {
      val preds = filters.toSeq.map(f =>
        TxLogV2Table.exactPredicate(f).getOrElse(
          throw new UnsupportedOperationException(
            s"txlog: cannot overwrite by filter $f (untranslatable)")))
      replacePred = Some(preds.reduce(_ && _))
    }
    this
  }

  /** UNPARTITIONED tables write NATIVELY: Spark's own vectorized parquet
    * v2 writer stages `InternalRow`s straight to a txlog staging dir —
    * no InternalRow→Row conversion anywhere on the write side — and the
    * staged files publish through the usual commit (stats + bloom
    * harvest, CHECK re-validation, optimistic manifest race). Append is
    * the degenerate group-replacement: replace nothing, carry everything.
    *
    * HIVE-PARTITIONED tables keep the V1 `InsertableRelation` route: its
    * single `partitionBy` staging pass writes the hive layout directly,
    * which beats a native flat write followed by a partition-aware
    * re-stage (two passes over the batch) — the row conversion is the
    * cheaper tax there until the writer routes partitions itself.
    */
  override def build(): Write = {
    val layout = tbl.table.latestVersion
      .map(tbl.table.partitionColsOf).getOrElse(Nil)
    // optimizeWrite tables take the V1 staging route even unpartitioned:
    // right-sizing needs to OWN a shuffle (stage()'s REBALANCE hint),
    // which a DSv2 Write cannot inject for a keyless rebalance —
    // RequiresDistributionAndOrdering only shuffles for a non-empty
    // clustering (DistributionAndOrderingUtils skips empty
    // distributions), so the native path would write the incoming
    // partitioning as-is, tiny files included. The row-conversion tax
    // is the price of target-sized files; tables that keep the native
    // zero-conversion write simply leave optimizeWrite off.
    val ow = tbl.table.latestVersion.exists(tbl.table.optimizeWriteOf)
    if (layout.nonEmpty || ow) v1Write else nativeWrite
  }

  private def v1Write: Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      (data: DataFrame, ovr: Boolean) => {
        val t = tbl.table
        val layout =
          t.latestVersion.map(t.partitionColsOf).getOrElse(Nil)
        replacePred match {
          case Some(pred) => t.replaceWhere(tbl.schema, pred, data)
          case None => t.commit(data, overwrite = overwrite || ovr,
            partitionCols = layout)
        }
      }
  }

  private def nativeWrite: Write = new Write {
    private val scratch = java.nio.file.Paths.get(
      graft.sources.TxLogTable.pathOfRoot(tbl.root), "data",
      "insert-" + java.util.UUID.randomUUID() + ".staging")
    // data files carry PHYSICAL column names; rows are positional, so
    // re-naming the writer's schema is the whole translation (same
    // contract as the row-level write path)
    private val physInfo: LogicalWriteInfo = {
      val cmap = tbl.table.latestVersion
        .map(tbl.table.colMapOf).getOrElse(Map.empty)
      if (cmap.isEmpty) info
      else new LogicalWriteInfo {
        override def options() = info.options()
        override def queryId() = info.queryId()
        override def schema() = StructType(info.schema().fields.map(f =>
          f.copy(name = cmap.getOrElse(f.name, f.name))))
        override def rowIdSchema() = info.rowIdSchema()
        override def metadataSchema() = info.metadataSchema()
      }
    }
    private val delegate =
      org.apache.spark.sql.execution.datasources.v2.parquet
        .ParquetWrite(Seq(scratch.toString), "parquet",
          (_: org.apache.spark.sql.types.DataType) => true, physInfo)

    override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
      new org.apache.spark.sql.connector.write.BatchWrite {
        private val inner = delegate.toBatch
        override def createBatchWriterFactory(
            pinfo: org.apache.spark.sql.connector.write.PhysicalWriteInfo) =
          inner.createBatchWriterFactory(pinfo)
        override def commit(
            messages: Array[org.apache.spark.sql.connector.write
              .WriterCommitMessage]): Unit = {
          inner.commit(messages)
          replacePred match {
            case Some(pred) =>
              // predicate-scoped overwrite: re-read the staged batch
              // (batch-sized, not table-sized) and route through
              // replaceWhere's validated predicate-scoped commit
              val spark = SparkSession.active
              val cmap = tbl.table.latestVersion
                .map(tbl.table.colMapOf).getOrElse(Map.empty)
              val raw = spark.read.schema(physInfo.schema())
                .parquet(scratch.toString)
              val logicalNames = info.schema().fieldNames
              val logical = raw.select(
                physInfo.schema().fieldNames.toIndexedSeq.zip(logicalNames)
                  .map { case (p, l) =>
                    org.apache.spark.sql.functions
                      .col("`" + p.replace("`", "``") + "`").as(l)
                  }: _*)
              try tbl.table.replaceWhere(tbl.schema, pred, logical)
              finally TxLogV2Table.dropDir(scratch)
            case None =>
              tbl.table.commitStagedReplace(scratch,
                replaced = if (overwrite) None else Some(Set.empty),
                op = if (overwrite) "overwrite" else "append")
          }
        }
        override def abort(
            messages: Array[org.apache.spark.sql.connector.write
              .WriterCommitMessage]): Unit = {
          inner.abort(messages)
          // vacuum deliberately protects .staging paths, so an aborted
          // write must delete its own scratch dir or leak it
          TxLogV2Table.dropDir(scratch)
        }
        override def useCommitCoordinator: Boolean =
          inner.useCommitCoordinator
      }
  }
}
