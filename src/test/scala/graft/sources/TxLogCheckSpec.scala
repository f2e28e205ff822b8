package graft.sources

import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** CHECK constraints: enforcement on append/dynamic/merge ingest, NULL
  * passes (SQL-standard), atomic rejection (nothing published), refusal
  * to add a check the current snapshot violates, survival across
  * overwrite and compaction.
  */
class TxLogCheckSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("amt", DoubleType)))

  private def fresh(): TxLogTable =
    TxLogTable(spark,
      java.nio.file.Files.createTempDirectory("txchk").resolve("t").toString)

  test("violating append is rejected atomically; valid rows pass") {
    val t = fresh()
    t.commit(Seq((1L, 5.0), (2L, 7.0)).toDF("id", "amt"), overwrite = true)
    t.addCheck(schema, "amt_pos", "amt >= 0")
    val v = t.latestVersion.get
    val ex = intercept[IllegalArgumentException] {
      t.commit(Seq((3L, -1.0), (4L, 2.0)).toDF("id", "amt"),
        overwrite = false)
    }
    assert(ex.getMessage.contains("amt_pos") && ex.getMessage.contains("1"))
    assert(t.latestVersion.get == v) // nothing published
    t.commit(Seq((5L, 0.0)).toDF("id", "amt"), overwrite = false)
    assert(t.snapshot(schema).count() == 3)
  }

  test("NULL passes a check (SQL-standard TRUE-or-NULL)") {
    val t = fresh()
    t.commit(Seq((1L, Some(1.0))).toDF("id", "amt"), overwrite = true)
    t.addCheck(schema, "amt_pos", "amt >= 0")
    t.commit(Seq((2L, Option.empty[Double])).toDF("id", "amt"),
      overwrite = false)
    assert(t.snapshot(schema).count() == 2)
  }

  test("cannot add a check the current snapshot violates") {
    val t = fresh()
    t.commit(Seq((1L, -5.0)).toDF("id", "amt"), overwrite = true)
    intercept[IllegalArgumentException] {
      t.addCheck(schema, "amt_pos", "amt >= 0")
    }
  }

  test("checks survive overwrite and compaction; merge validates incoming") {
    val t = fresh()
    t.commit(Seq((1L, 1.0)).toDF("id", "amt"), overwrite = true)
    t.addCheck(schema, "amt_pos", "amt >= 0")
    t.commit(Seq((9L, 9.0)).toDF("id", "amt"), overwrite = true)
    assert(t.checksOf(t.latestVersion.get).contains("amt_pos"))
    intercept[IllegalArgumentException] {
      t.commit(Seq((2L, -1.0)).toDF("id", "amt"), overwrite = false)
    }
    t.compact(schema) // maintenance rewrite: no re-validation, checks kept
    assert(t.checksOf(t.latestVersion.get).contains("amt_pos"))
    intercept[IllegalArgumentException] {
      t.merge(schema, Seq((9L, -2.0)).toDF("id", "amt"), Seq("id"))
    }
    t.merge(schema, Seq((9L, 2.0)).toDF("id", "amt"), Seq("id"))
    assert(t.snapshot(schema).collect().map(r => (r.getLong(0),
      r.getDouble(1))).toSet == Set((9L, 2.0)))
  }
}
