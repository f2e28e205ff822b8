package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** String range stats (`:spre:` 7-byte-prefix embedding of the parquet
  * footer's min/max bytes): manifest pruning for string RANGE predicates,
  * the soundness edges of the truncated encoding, and the string z-order
  * dimension.
  */
class TxLogStringStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType)))

  test("encoding is monotone and floor/ceil bracket truncation") {
    import TxLogTable.{strEncCeil, strEncFloor}
    val sorted = Seq("", "a", "ab", "abcdefg", "abcdefgh", "abcdefgz",
      "abcdefh", "b", "ba")
    sorted.sliding(2).foreach { case Seq(a, b) =>
      assert(strEncFloor(a) <= strEncFloor(b), s"floor($a) > floor($b)")
    }
    // untruncated strings: floor == ceil (exact)
    assert(strEncFloor("abc") == strEncCeil("abc"))
    // truncation drops everything past byte 7: same prefix → same floor,
    // and ceil = floor + 1 bounds EVERY continuation from above
    assert(strEncFloor("abcdefgh") == strEncFloor("abcdefgzzz"))
    assert(strEncCeil("abcdefgh") == strEncFloor("abcdefgh") + 1)
    assert(strEncCeil("abcdefgzzz") >= strEncFloor("abcdefgh"))
  }

  test("string range predicate prunes files from the manifest") {
    val t = TxLogTable(spark,
      Files.createTempDirectory("txstr").resolve("t").toString)
    // three band-disjoint commits on the string column
    t.commit(Seq((1L, "alpha"), (2L, "ant")).toDF("id", "s"),
      overwrite = true)
    t.commit(Seq((3L, "mango"), (4L, "melon")).toDF("id", "s"),
      overwrite = false)
    t.commit(Seq((5L, "zebra"), (6L, "zulu")).toDF("id", "s"),
      overwrite = false)
    val total = t.fileCount()
    val mid = t.candidateFilesWhere(col("s") >= "m" && col("s") <= "n")
    assert(mid.size < total, s"pruned nothing: ${mid.size} of $total")
    // results identical to the unpruned filter
    val rows = t.snapshotWhere(schema, col("s") >= "m" && col("s") <= "n")
      .collect().map(_.getLong(0)).sorted
    assert(rows.toSeq == Seq(3L, 4L))
    // equality predicates prune through the same stats
    assert(t.candidateFilesWhere(col("s") === "zebra").size < total)
    assert(t.snapshotWhere(schema, col("s") === "zebra")
      .collect().map(_.getLong(0)).toSeq == Seq(5L))
  }

  test("shared prefixes beyond 7 bytes cannot prune — and stay sound") {
    val t = TxLogTable(spark,
      Files.createTempDirectory("txstr2").resolve("t").toString)
    t.commit(Seq((1L, "Customer#000000001")).toDF("id", "s"),
      overwrite = true)
    t.commit(Seq((2L, "Customer#000000777")).toDF("id", "s"),
      overwrite = false)
    // the 7-byte prefix is identical: both files stay candidates (no
    // unsound skip), and the filter still returns the right rows
    val cand = t.candidateFilesWhere(col("s") === "Customer#000000777")
    assert(cand.size == t.fileCount())
    assert(t.snapshotWhere(schema, col("s") === "Customer#000000777")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("z-order with a string dimension: both columns prune after rewrite") {
    val t = TxLogTable(spark,
      Files.createTempDirectory("txstr3").resolve("t").toString)
    val rows = (0 until 256).map(i =>
      (i.toLong, f"${('a' + i % 16).toChar}%c-key-$i%03d"))
    t.commit(rows.toDF("id", "s").repartition(8), overwrite = true)
    t.compactZOrder(schema, "s", "id", numFiles = 8)
    val total = t.fileCount()
    val sPruned = t.candidateFilesWhere(
      col("s") >= "c" && col("s") <= "d").size
    val idPruned = t.candidateFilesWhere(
      col("id") >= 0L && col("id") <= 31L).size
    assert(sPruned < total, s"string dim pruned nothing ($sPruned/$total)")
    assert(idPruned < total, s"id dim pruned nothing ($idPruned/$total)")
    // and the pruned read is still exact
    val got = t.snapshotWhere(schema, col("s") >= "c" && col("s") <= "d")
      .collect().map(_.getString(1)).toSet
    assert(got == rows.filter(r => r._2 >= "c" && r._2 <= "d")
      .map(_._2).toSet)
  }
}
