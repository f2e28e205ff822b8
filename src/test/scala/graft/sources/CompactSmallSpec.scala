package graft.sources

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Incremental small-file compaction: only sub-threshold files rewritten,
  * large files carried by reference, data preserved, MOR tombstones
  * materialized for rewritten files, partitioned layouts kept.
  */
class CompactSmallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def fresh(): TxLogTable =
    TxLogTable(spark,
      java.nio.file.Files.createTempDirectory("txcsm").resolve("t").toString)

  test("packs only small files; the large file is carried untouched") {
    val t = fresh()
    // one big file, four tiny appends
    t.commit((1L to 2000L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(1), overwrite = true)
    (0 until 4).foreach(i =>
      t.commit(Seq((10000L + i, "tiny")).toDF("id", "v"), overwrite = false))
    val bigRel = t.fileSizes().maxBy(_._2)._1
    val thresh = t.fileSizes().map(_._2).max
    val st = t.compactSmall(schema, minBytes = thresh)
    assert(st.rewritten == 4 && st.carried == 1)
    assert(t.fileCount() == 2) // big + one packed
    assert(t.entries().exists(_.rel == bigRel)) // same physical file
    assert(t.snapshot(schema).count() == 2004)
    // idempotent: nothing small left to pack (single packed straggler)
    val st2 = t.compactSmall(schema, minBytes = thresh)
    assert(st2.rewritten == 0)
  }

  test("partitioned layout: packing clusters by partition value") {
    val t = fresh()
    val df = (1L to 200L).map(i => (i, s"p${i % 2}")).toDF("id", "v")
    t.commit(df.repartition(1), overwrite = true, partitionCols = Seq("v"))
    (0 until 3).foreach(i => t.commit(
      Seq((1000L + i, "p0")).toDF("id", "v"), overwrite = false,
      partitionCols = Seq("v")))
    val before = t.fileCount()
    val thresh = t.fileSizes().map(_._2).max
    val st = t.compactSmall(schema, minBytes = thresh)
    assert(st.rewritten >= 3 && t.fileCount() < before)
    assert(t.snapshot(schema).count() == 203)
    // layout preserved: every file still lives under a v= hive dir
    assert(t.entries().forall(_.rel.contains("v=")))
  }

  test("reads through the MOR mask: rewritten files materialize deletes") {
    val t = fresh()
    t.commit((1L to 100L).map(i => (i, "x")).toDF("id", "v")
      .repartition(1), overwrite = true)
    (0 until 3).foreach(i =>
      t.commit(Seq((200L + i, "tiny")).toDF("id", "v"), overwrite = false))
    t.deleteByKeysMor(Seq(201L).toDF("id"))
    val thresh = t.fileSizes().map(_._2).max
    t.compactSmall(schema, minBytes = thresh)
    assert(t.snapshot(schema).count() == 102)
    assert(!t.snapshot(schema).collect().map(_.getLong(0)).contains(201L))
  }
}
