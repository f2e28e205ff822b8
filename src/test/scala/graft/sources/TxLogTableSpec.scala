package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Transaction-log table: commit visibility, append semantics, crash
  * atomicity (staged-but-unpublished files invisible), time travel, and
  * optimistic-concurrency retry.
  */
class TxLogTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def fresh(): TxLogTable =
    TxLogTable(spark,
      Files.createTempDirectory("txlog").resolve("t").toString)

  private def rows(t: TxLogTable, version: Option[Int] = None): Set[(Long, String)] =
    t.snapshot(schema, version).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("absent table reads empty with schema; commits become visible") {
    val t = fresh()
    assert(t.latestVersion.isEmpty && rows(t).isEmpty)
    val v0 = t.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      overwrite = true)
    assert(v0 == 0 && rows(t) == Set((1L, "a"), (2L, "b")))
  }

  test("append carries prior files; overwrite starts fresh; time travel") {
    val t = fresh()
    t.commit(Seq((1L, "a")).toDF("id", "v"), overwrite = true)
    val v1 = t.commit(Seq((2L, "b")).toDF("id", "v"), overwrite = false)
    assert(v1 == 1 && rows(t) == Set((1L, "a"), (2L, "b")))
    val v2 = t.commit(Seq((9L, "z")).toDF("id", "v"), overwrite = true)
    assert(v2 == 2 && rows(t) == Set((9L, "z")))
    // every old version still readable
    assert(rows(t, Some(0)) == Set((1L, "a")))
    assert(rows(t, Some(1)) == Set((1L, "a"), (2L, "b")))
    assert(t.versions == Seq(0, 1, 2))
  }

  test("staged data without a manifest is invisible (crash atomicity)") {
    val t = fresh()
    t.commit(Seq((1L, "a")).toDF("id", "v"), overwrite = true)
    // simulate a writer that crashed after staging: data files exist,
    // no manifest references them
    Seq((666L, "ghost")).toDF("id", "v").write
      .parquet(Paths.get(t.root, "data", "batch-crashed").toString)
    assert(rows(t) == Set((1L, "a")))
  }

  test("losing the version race retries onto the next version") {
    val t = fresh()
    t.commit(Seq((1L, "a")).toDF("id", "v"), overwrite = true)
    // occupy v1 manifest out-of-band: the next commit must land on v2
    Files.createDirectories(Paths.get(t.root, "_log"))
    Files.write(Paths.get(t.root, "_log", "v00000001.manifest"),
      "".getBytes(UTF_8), StandardOpenOption.CREATE_NEW)
    val v = t.commit(Seq((2L, "b")).toDF("id", "v"), overwrite = false)
    assert(v == 2)
    // the squatter v1 is an empty table; v2 appended onto latest-at-retry
    // (v1's empty manifest), so it carries only the delta
    assert(rows(t, Some(2)) == Set((2L, "b")))
    assert(rows(t, Some(0)) == Set((1L, "a")))
  }
}
