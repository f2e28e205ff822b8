package graft.sources

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Per-file Bloom filters: wire round-trip, Spark-harvest / driver-probe
  * hash agreement (no false negatives), point-lookup pruning where range
  * stats cannot prune, type-coercion soundness guards, and inheritance of
  * the bloom-column table property across rewrites.
  */
class TxLogBloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  private def fresh(): TxLogTable =
    TxLogTable(spark,
      java.nio.file.Files.createTempDirectory("txbloom").resolve("t").toString)

  // ids interleaved mod nFiles: every file spans ~the full id range, so
  // min/max stats prune NOTHING and any skip observed is the bloom's
  private def scattered(t: TxLogTable, n: Long, files: Int,
                        bloomCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.{concat, lit}
    val df = spark.range(n)
      .select(col("id"), concat(lit("n-"), col("id").cast("string")).as("name"))
      .repartition(files, col("id") % files)
    t.commit(df, overwrite = true, bloomCols = bloomCols)
  }

  test("bloom wire format round-trips through encode/decode") {
    val b = TxLogTable.Bloom.fromPositions(256, 3, 'i', Seq(0, 63, 64, 255))
    val e = TxLogTable.FileEntry("a/b.parquet", Map("id" -> (1L, 9L)),
      Map("id" -> b))
    val d = TxLogTable.decodeEntry(e.encoded)
    assert(d.rel == "a/b.parquet" && d.stats("id") == (1L, 9L))
    val db = d.blooms("id")
    assert(db.m == 256 && db.k == 3 && db.typ == 'i')
    assert(db.bits.toSeq == b.bits.toSeq)
    // blooms with no range stats: empty middle field survives
    val only = TxLogTable.FileEntry("c.parquet", Map.empty, Map("id" -> b))
    val d2 = TxLogTable.decodeEntry(only.encoded)
    assert(d2.stats.isEmpty && d2.blooms.contains("id"))
    // a malformed bloom token degrades to "no bloom", never a crash
    val bad = TxLogTable.decodeEntry("f.parquet\t\tid=not-a-bloom")
    assert(bad.blooms.isEmpty && bad.rel == "f.parquet")
  }

  test("harvested blooms have no false negatives (Spark md5 == driver md5)") {
    val t = fresh()
    scattered(t, 200, 4, Seq("id", "name"))
    val es = t.entries()
    // hash partitioning may leave a partition empty: ≥2 files is enough
    assert(es.size >= 2 && es.forall(e =>
      e.blooms.contains("id") && e.blooms.contains("name")))
    // every committed value must probe TRUE in its own file's bloom —
    // read each file back and check (the no-false-negative contract)
    es.foreach { e =>
      val rows = spark.read.parquet(
        java.nio.file.Paths.get(t.root, "data", e.rel).toString).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(e.blooms("id").mightContain(r.getLong(0).toString))
        assert(e.blooms("name").mightContain(r.getString(1)))
      }
    }
  }

  test("point lookup prunes scattered files where ranges cannot") {
    val t = fresh()
    scattered(t, 400, 8, Seq("id"))
    val total = t.fileCount()
    // ranges alone: the scattered layout defeats min/max entirely
    assert(t.candidateFiles("id", 123L, 123L).size == total)
    // bloom: id = 123 lives in exactly one file; FPP may admit a couple
    val hit = t.candidateFilesWhere(col("id") === 123L)
    assert(hit.size < total,
      s"bloom pruned nothing: ${hit.size} of $total")
    // the surviving set still yields the row (pruning lost nothing)
    val got = t.snapshotWhere(schema, col("id") === 123L).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(123L))
    // IN-list unions probes; a value beyond the domain prunes everything
    assert(t.candidateFilesWhere(col("id").isin(123L, 7L)).size < total)
    assert(t.snapshotWhere(schema, col("id") === 999999L).count() == 0)
    // string bloom prunes too, and equality returns the right row
    val t2 = fresh()
    scattered(t2, 400, 8, Seq("id", "name"))
    val byName = t2.candidateFilesWhere(col("name") === "n-123")
    assert(byName.size < t2.fileCount())
    assert(t2.snapshotWhere(schema, col("name") === "n-123")
      .collect().map(_.getLong(0)).toSeq == Seq(123L))
  }

  test("coercion guards: cross-type probes never prune (soundness)") {
    val t = fresh()
    // names like "05" — numerically equal to 5 under SQL coercion but
    // canonically different; the string bloom must refuse integral probes
    val df = spark.range(100).select(col("id"),
      org.apache.spark.sql.functions.format_string("%02d", col("id"))
        .as("name")).repartition(4, col("id") % 4)
    t.commit(df, overwrite = true, bloomCols = Seq("id", "name"))
    val total = t.fileCount()
    // integral literal vs string column: no pruning allowed
    assert(t.candidateFilesWhere(col("name") === 5L).size == total)
    // string literal vs integral column: normalized "05" -> "5" still probes
    assert(t.candidateFilesWhere(col("id") === "05").size < total)
    assert(t.snapshotWhere(schema, col("id") === "05")
      .collect().map(_.getLong(0)).toSeq == Seq(5L))
    // unparseable string vs integral column: no pruning
    assert(t.candidateFilesWhere(col("id") === "abc").size == total)
    // contradictory equality proves emptiness: prune every file
    assert(t.candidateFilesWhere(col("id") === 3L && col("id") === 4L).isEmpty)
  }

  test("bloom columns inherit across append, merge, delete and compaction") {
    val t = fresh()
    scattered(t, 100, 4, Seq("id"))
    assert(t.bloomColsOf(t.latestVersion.get) == Seq("id"))
    // plain append: no bloomCols passed, property inherited
    t.commit(Seq((1000L, "x")).toDF("id", "name"), overwrite = false)
    assert(t.entries().forall(_.blooms.contains("id")))
    // merge rewrite keeps filters on rewritten files
    t.merge(schema, Seq((50L, "updated")).toDF("id", "name"), Seq("id"))
    assert(t.entries().forall(_.blooms.contains("id")))
    // delete rewrite too
    t.deleteWhere(schema, col("id") === 51L)
    assert(t.entries().forall(_.blooms.contains("id")))
    // compaction rewrites the whole table and keeps the property
    t.compact(schema, numFiles = 2)
    assert(t.entries().forall(_.blooms.contains("id")))
    assert(t.bloomColsOf(t.latestVersion.get) == Seq("id"))
    // and the data survived it all
    val ids = t.snapshot(schema).collect().map(_.getLong(0)).toSet
    assert(ids.contains(1000L) && ids.contains(50L) && !ids.contains(51L))
  }
}
