package graft.sources

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The format("txlog") connector: short-name registration, snapshot
  * equality, schema inference and explicit schema, version option (time
  * travel), SQL-over-view usage, filter correctness through the pushdown
  * path, and MOR tombstone masking through the connector.
  */
class TxLogRelationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def fresh(): TxLogTable =
    TxLogTable(spark,
      java.nio.file.Files.createTempDirectory("txrel").resolve("t").toString)

  test("format(txlog) reads the snapshot; version option time-travels") {
    val t = fresh()
    t.commit((1L to 5L).map(i => (i, s"v$i")).toDF("id", "v"),
      overwrite = true)
    t.commit(Seq((9L, "late")).toDF("id", "v"), overwrite = false)
    val df = spark.read.format("txlog").load(t.root)
    assert(df.count() == 6)
    assert(df.schema.fieldNames.toSet == Set("id", "v"))
    val v0 = spark.read.format("txlog").option("version", 0).load(t.root)
    assert(v0.count() == 5)
  }

  test("format(txlog) reads splice to the native parquet plan " +
    "(no V1 row-conversion scan) with the extension installed") {
    val t = fresh()
    t.commit((1L to 20L).map(i => (i, s"v$i")).toDF("id", "v"),
      overwrite = true)
    val df = spark.read.format("txlog").load(t.root).filter(col("id") > 15)
      .select(col("id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet"),
      s"expected the native parquet scan:\n$plan")
    assert(!plan.contains("ExistingRDD") && !plan.contains("RDDScan"),
      s"V1 row-conversion scan survived the splice:\n$plan")
    // parquet row-group pushdown rides the spliced plan too
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("GreaterThan(id,15)"), plan)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq ==
      (16L to 20L).toSeq)
    // the version option still time-travels through the splice
    t.commit(Seq((99L, "late")).toDF("id", "v"), overwrite = false)
    val v0 = spark.read.format("txlog").option("version", 0).load(t.root)
    assert(v0.count() == 20)
    assert(!v0.queryExecution.executedPlan.toString.contains("ExistingRDD"))
  }

  test("filters prune via the manifest and still return exact rows") {
    val t = fresh()
    // scattered layout + bloom: the pushdown path has something to skip
    val df = spark.range(200)
      .select(col("id"), col("id").cast("string").as("v"))
      .repartition(4, org.apache.spark.sql.functions.pmod(col("id"), lit4))
    t.commit(df, overwrite = true, bloomCols = Seq("id"))
    val r = spark.read.format("txlog").load(t.root)
    assert(r.filter(col("id") === 77L).collect().map(_.getLong(0)).toSeq ==
      Seq(77L))
    assert(r.filter(col("id") >= 190L).count() == 10)
    // SQL over the connector
    r.createOrReplaceTempView("txlog_rel_test")
    assert(spark.sql(
      "SELECT count(*) FROM txlog_rel_test WHERE id < 10").head.getLong(0)
      == 10)
  }

  private def lit4 = org.apache.spark.sql.functions.lit(4)

  test("MOR tombstones mask through the connector") {
    val t = fresh()
    t.commit((1L to 10L).map(i => (i, "x")).toDF("id", "v"),
      overwrite = true)
    t.deleteByKeysMor(Seq(3L, 4L).toDF("id"))
    val r = spark.read.format("txlog").load(t.root)
    assert(r.collect().map(_.getLong(0)).toSet ==
      (1L to 10L).toSet -- Set(3L, 4L))
  }

  test("df.write.format(txlog) maps SaveMode onto the commit protocol") {
    import org.apache.spark.sql.SaveMode
    val root = java.nio.file.Files.createTempDirectory("txwrite")
      .resolve("t").toString
    Seq((1L, "a")).toDF("id", "v").write.format("txlog")
      .mode(SaveMode.ErrorIfExists).save(root)
    Seq((2L, "b")).toDF("id", "v").write.format("txlog")
      .mode(SaveMode.Append).save(root)
    assert(spark.read.format("txlog").load(root).count() == 2)
    intercept[IllegalStateException] {
      Seq((3L, "c")).toDF("id", "v").write.format("txlog")
        .mode(SaveMode.ErrorIfExists).save(root)
    }
    Seq((3L, "c")).toDF("id", "v").write.format("txlog")
      .mode(SaveMode.Ignore).save(root) // no-op on existing table
    assert(spark.read.format("txlog").load(root).count() == 2)
    Seq((9L, "z")).toDF("id", "v").write.format("txlog")
      .mode(SaveMode.Overwrite).save(root)
    assert(spark.read.format("txlog").load(root)
      .collect().map(_.getLong(0)).toSeq == Seq(9L))
    // the destination is a full tx-log table: history + time travel work
    val t = TxLogTable(spark, root)
    assert(t.versions.size == 3 && t.snapshot(schema, Some(1)).count() == 2)
  }

  test("explicit schema read of an empty table; inference refuses") {
    val t = fresh()
    intercept[IllegalArgumentException] {
      spark.read.format("txlog").load(t.root).count()
    }
    // an empty-but-created table with explicit schema reads empty
    t.commit(Seq.empty[(Long, String)].toDF("id", "v"), overwrite = true)
    val r = spark.read.format("txlog").schema(schema).load(t.root)
    assert(r.count() == 0 && r.schema == schema)
  }
}
