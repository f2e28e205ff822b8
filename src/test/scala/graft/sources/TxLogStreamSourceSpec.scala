package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The readStream.format("txlog") change-feed source: initial snapshot as
  * the first micro-batch, later commits arriving incrementally (no
  * rescan), and schema agreement with the batch connector.
  */
class TxLogStreamSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("streams each committed version exactly once") {
    val t = TxLogTable(spark,
      java.nio.file.Files.createTempDirectory("txstream")
        .resolve("t").toString)
    t.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), overwrite = true)

    val q = spark.readStream.format("txlog").schema(schema).load(t.root)
      .writeStream.format("memory").queryName("txlog_feed")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("txstream-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("txlog_feed").collect()
        .map(_.getLong(0)).toSet == Set(1L, 2L))
      // two more commits: each arrives as its own delta, nothing re-read
      t.commit(Seq((3L, "c")).toDF("id", "v"), overwrite = false)
      q.processAllAvailable()
      assert(spark.table("txlog_feed").count() == 3)
      t.commit(Seq((4L, "d"), (5L, "e")).toDF("id", "v"), overwrite = false)
      q.processAllAvailable()
      val rows = spark.table("txlog_feed").collect()
      assert(rows.map(_.getLong(0)).toSet == (1L to 5L).toSet)
      assert(rows.length == 5) // exactly once: no duplicates from rescans
    } finally q.stop()
  }

  test("inferred schema matches the batch connector's") {
    val t = TxLogTable(spark,
      java.nio.file.Files.createTempDirectory("txstream2")
        .resolve("t").toString)
    t.commit(Seq((1L, "a")).toDF("id", "v"), overwrite = true)
    val stream = spark.readStream.format("txlog").load(t.root)
    val batch = spark.read.format("txlog").load(t.root)
    assert(stream.schema == batch.schema && stream.isStreaming)
  }
}
