package graft.sources

import org.apache.spark.sql.functions.{col, concat, lit}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Positional deletes (deletion-vector style): O(matched rows) commit
  * with ZERO data files rewritten, arbitrary (non-key) predicates,
  * exact metadata COUNT(*) by subtraction, mask disjointness across
  * commits, positional UPDATE (mask + touched-rows-only restage),
  * exact CDC delete events (surviving an in-range rewrite fold),
  * compaction materialization, vacuum protection of DV parquets,
  * time travel / restore / clone, tombstone interaction, and the
  * broadcast-size cap refusal.
  */
class TxLogDvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("cat", StringType),
    StructField("x", LongType)))

  private def fresh(): TxLogTable =
    TxLogTable(spark,
      java.nio.file.Files.createTempDirectory("txdv").resolve("t").toString)

  private def rows(t: TxLogTable,
                   v: Option[Int] = None): Set[(Long, String, Long)] =
    t.snapshot(schema, v).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  private def seed(t: TxLogTable): Unit = {
    // exactly two files so some are affected and some carried
    t.commit((0L until 6L).map(i => (i, if (i % 2 == 0) "a" else "b", i))
      .toDF("id", "cat", "x").coalesce(1), overwrite = true)       // v0
    t.commit((6L until 10L).map(i => (i, "c", i))
      .toDF("id", "cat", "x").coalesce(1), overwrite = false)      // v1
  }

  test("deleteWherePos: zero rewrite, arbitrary non-key predicate, " +
      "exact metadata count, disjoint second mask") {
    val t = fresh(); seed(t)
    val filesBefore = t.entries(None).map(_.rel).toSet
    val st = t.deleteWherePos(schema, col("cat") === "a" && col("x") < 4)
    assert(st.rewritten == 0, "positional delete must rewrite nothing")
    assert(t.entries(None).map(_.rel).toSet == filesBefore,
      "data file set must be untouched")
    assert(t.history().last.op.contains("delete-dv"))
    assert(rows(t).map(_._1) == Set(1L, 3L, 4L, 5L, 6L, 7L, 8L, 9L))
    // exact metadata count under the live mask (tombstones would decline)
    assert(t.metaRowCount(None).contains(8L))
    // MIN/MAX must decline: a masked row could be the extremum
    assert(t.metaMinMax("x").isEmpty)
    // overlapping second delete: already-masked positions never re-mask
    t.deleteWherePos(schema, col("x") <= 4)
    assert(rows(t).map(_._1) == Set(5L, 6L, 7L, 8L, 9L))
    assert(t.metaRowCount(None).contains(5L))
    val totalMasked = t.dvsOf(t.latestVersion.get).map(_.n).sum
    assert(totalMasked == 5L, s"masks must be disjoint: $totalMasked")
    // a predicate matching nothing is a clean no-op (no version)
    val v = t.latestVersion.get
    val noop = t.deleteWherePos(schema, col("x") > 1000)
    assert(noop.version == v && t.latestVersion.contains(v))
  }

  test("updateWherePos: mask + touched-rows-only restage, CDC " +
      "delete/insert pairs, appends carry the mask") {
    val t = fresh(); seed(t)
    val nFiles = t.fileCount()
    val st = t.updateWherePos(schema, col("cat") === "c" && col("x") >= 8,
      Seq("x" -> (col("x") + 100), "cat" -> lit("C")))
    assert(st.rewritten == 0)
    assert(t.history().last.op.contains("update-dv"))
    // old files untouched, exactly the touched rows re-staged as new
    assert(t.fileCount() > nFiles)
    assert(rows(t) == Set(
      (0L, "a", 0L), (1L, "b", 1L), (2L, "a", 2L), (3L, "b", 3L),
      (4L, "a", 4L), (5L, "b", 5L), (6L, "c", 6L), (7L, "c", 7L),
      (8L, "C", 108L), (9L, "C", 109L)))
    assert(t.metaRowCount(None).contains(10L))
    // CDC: the update surfaces as exact delete+insert pairs at its version
    val v = t.latestVersion.get
    val feed = t.changesWithDeletes(schema, v - 1, v)
      .collect().map(r => (r.getString(4), r.getLong(0), r.getLong(2)))
      .toSet
    assert(feed == Set(("delete", 8L, 8L), ("delete", 9L, 9L),
      ("insert", 8L, 108L), ("insert", 9L, 109L)), s"feed: $feed")
    // an append carries the mask untouched
    t.commit(Seq((20L, "z", 20L)).toDF("id", "cat", "x"),
      overwrite = false)
    assert(rows(t).map(_._1).intersect(Set(8L, 9L)) == Set(8L, 9L),
      "updated rows survive") // via the new file
    assert(rows(t).size == 11 && t.metaRowCount(None).contains(11L))
    assert(t.dvsOf(t.latestVersion.get).nonEmpty, "append keeps mask")
  }

  test("time travel, restore and clone see each version's own mask") {
    val t = fresh(); seed(t)
    t.deleteWherePos(schema, col("id") < 3)                        // v2
    t.commit(Seq((30L, "z", 30L)).toDF("id", "cat", "x"),
      overwrite = false)                                           // v3
    assert(rows(t, Some(1)).map(_._1) == (0L until 10L).toSet,
      "pre-delete snapshot is unmasked")
    assert(rows(t, Some(2)).map(_._1) == (3L until 10L).toSet)
    // restore to v1: mask gone; restore to v3 re-applies it
    t.restore(1)                                                   // v4
    assert(rows(t).map(_._1) == (0L until 10L).toSet)
    t.restore(3)                                                   // v5
    assert(rows(t).map(_._1) == (3L until 10L).toSet + 30L)
    // clone carries mask + DV parquet (hard links)
    val dest = java.nio.file.Files.createTempDirectory("txdvc")
      .resolve("c").toString
    t.cloneTo(dest)
    val c = TxLogTable(spark, dest)
    assert(rows(c).map(_._1) == (3L until 10L).toSet + 30L)
  }

  test("compaction materializes the mask; compactSmall carries it for " +
      "untouched files; vacuum protects then reclaims the DV parquet") {
    val t = fresh(); seed(t)
    t.deleteWherePos(schema, col("id") === 0L)                     // v2
    val dvRel = t.dvsOf(t.latestVersion.get).head.dvRel
    // vacuum with the mask live: DV parquet survives (referenced)
    t.vacuum(keep = 1, minAgeMillis = 0L, retainMillis = 0L)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(t.root, "data", dvRel)),
      "live DV parquet must survive vacuum")
    assert(rows(t).map(_._1) == (1L until 10L).toSet)
    t.compact(schema)
    assert(t.dvsOf(t.latestVersion.get).isEmpty,
      "compaction must fold the mask")
    assert(rows(t).map(_._1) == (1L until 10L).toSet)
    assert(t.metaMinMax("x").contains((1L, 9L)), "min/max exact again")
    // after the fold, vacuum reclaims the DV parquet
    t.vacuum(keep = 1, minAgeMillis = 0L, retainMillis = 0L)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(t.root, "data", dvRel)),
      "folded DV parquet must be reclaimed")
    assert(rows(t).map(_._1) == (1L until 10L).toSet)
  }

  test("compactSmall rewrites masked small files and carries the mask " +
      "only for surviving targets") {
    val t = fresh(); seed(t)
    t.deleteWherePos(schema, col("id") === 1L || col("id") === 7L) // both files
    assert(t.dvsOf(t.latestVersion.get).size == 2)
    // both seed files are tiny: everything compacts, mask fully folds
    val st = t.compactSmall(schema, minBytes = 1L << 20)
    assert(st.rewritten == 2)
    assert(t.dvsOf(t.latestVersion.get).isEmpty,
      "mask lines must not outlive their rewritten targets")
    assert(rows(t).map(_._1) == (0L until 10L).toSet -- Set(1L, 7L))
  }

  test("CDC delete events survive an in-range compaction folding the " +
      "mask; cowDiffEvents never phantom-deletes masked rows") {
    val t = fresh(); seed(t)
    t.deleteWherePos(schema, col("id").isin(2L, 6L))               // v2
    t.commit(Seq((40L, "z", 40L)).toDF("id", "cat", "x"),
      overwrite = false)                                           // v3
    t.compact(schema)                                              // v4 folds
    assert(t.dvsOf(t.latestVersion.get).isEmpty, "precondition")
    val feed = t.changesWithDeletes(schema, 1, t.latestVersion.get,
        skipRewrites = true)
      .collect().map(r => (r.getString(4), r.getLong(0))).toSet
    assert(feed == Set(("delete", 2L), ("delete", 6L), ("insert", 40L)),
      s"folded DV events lost or phantoms appeared: $feed")
    // COW delete of a file WITH masked rows: the diff reads through the
    // mask — masked rows must not re-surface as phantom deletes
    val t2 = fresh(); seed(t2)
    t2.deleteWherePos(schema, col("id") === 3L)                    // v2
    t2.deleteWhere(schema, col("id") < 6L)                         // v3 (COW)
    val f2 = t2.changesWithDeletes(schema, 2, 3)
      .collect().map(r => (r.getString(4), r.getLong(0))).toSet
    assert(f2 == Set(("delete", 0L), ("delete", 1L), ("delete", 2L),
      ("delete", 4L), ("delete", 5L)),
      s"phantom delete of the already-masked id=3: $f2")
  }

  test("tombstone + DV masks compose; partition-scoped metadata count " +
      "subtracts exactly") {
    val t = fresh()
    t.commit((0L until 8L).map(i => (i, (i % 2).toString, i))
      .toDF("id", "cat", "x"), overwrite = true,
      partitionCols = Seq("cat"))
    t.deleteWherePos(schema, col("x") === 2L)
    t.deleteByKeysMor(Seq(5L).toDF("id"))
    assert(rows(t).map(_._1) == Set(0L, 1L, 3L, 4L, 6L, 7L))
    // tombstones live: unscoped metadata count must decline
    assert(t.metaRowCount(None).isEmpty)
    val t2 = fresh()
    t2.commit((0L until 8L).map(i => (i, (i % 2).toString, i))
      .toDF("id", "cat", "x"), overwrite = true,
      partitionCols = Seq("cat"))
    t2.deleteWherePos(schema, col("x") === 2L) // lives in cat=0
    assert(t2.metaRowCountWhere(Map("cat" -> Set("0"))).contains(3L))
    assert(t2.metaRowCountWhere(Map("cat" -> Set("1"))).contains(4L))
    assert(t2.metaMinMaxWhere("x", Map("cat" -> Set("1")))
      .contains(Some((1L, 7L))), "unmasked partition stays exact")
    assert(t2.metaMinMaxWhere("x", Map("cat" -> Set("0"))).isEmpty,
      "masked partition's extremum must decline")
  }

  test("mask-size cap refuses with 'compact first'; update validates " +
      "CHECK constraints") {
    val t = fresh(); seed(t)
    spark.conf.set("spark.graft.sql.maxDvMaskRows", "3")
    try {
      val e = intercept[IllegalArgumentException] {
        t.deleteWherePos(schema, col("x") < 5L) } // 5 rows > cap 3
      assert(e.getMessage.contains("compact the table first"),
        e.getMessage)
    } finally spark.conf.unset("spark.graft.sql.maxDvMaskRows")
    // CHECK constraints gate the update's restaged rows
    t.addCheck(schema, "x_small", "x < 50")
    val e2 = intercept[IllegalArgumentException] {
      t.updateWherePos(schema, col("id") === 1L,
        Seq("x" -> (col("x") + 1000))) }
    assert(e2.getMessage.contains("x_small"), e2.getMessage)
    // and masks never break the schema contract for later appends
    assert(rows(t).size == 10)
  }

  test("mask collect is headroom-bounded: under-cap delete through the " +
      "take probe is complete; over-cap refuses without a full pull") {
    val t = fresh(); seed(t) // 10 rows in 2 files: manifest upper bound 10
    spark.conf.set("spark.graft.sql.maxDvMaskRows", "5")
    try {
      // headroom 5 < upper bound 10 routes boundedMaskCollect to the
      // take(headroom+1) probe; 2 matches ≤ headroom must commit the
      // COMPLETE mask (take returns every row when fewer than n exist)
      val st = t.deleteWherePos(schema, col("x") < 2L)
      assert(st.rewritten == 0)
      assert(rows(t).map(_._1) == (2L until 10L).toSet)
      assert(t.metaRowCount(None).contains(8L))
      // 6 more matches would land the live mask at 8 > cap 5: the probe
      // pulls at most headroom+1 rows and the commit refuses cleanly
      val e = intercept[IllegalArgumentException] {
        t.deleteWherePos(schema, col("x") < 8L) }
      assert(e.getMessage.contains("compact the table first"), e.getMessage)
      assert(rows(t).map(_._1) == (2L until 10L).toSet,
        "refused delete must not change the table")
      // the keyed MOR upsert path shares the bound: over-cap refuses too
      val e2 = intercept[IllegalArgumentException] {
        t.upsertPos(schema, (0L until 10L).map(i => (i, "z", i * 10))
          .toDF("id", "cat", "x"), Seq("id")) }
      assert(e2.getMessage.contains("compact the table first"),
        e2.getMessage)
    } finally spark.conf.unset("spark.graft.sql.maxDvMaskRows")
  }

  test("column mapping: positional delete and read compose with a " +
      "renamed column") {
    val t = fresh()
    t.create(schema) // recorded #schema: rename needs a catalog table
    seed(t)
    t.renameColumn("x", "amount")
    val renamed = StructType(Seq(
      StructField("id", LongType), StructField("cat", StringType),
      StructField("amount", LongType)))
    t.deleteWherePos(renamed, col("amount") >= 8L)
    assert(t.snapshot(renamed).collect().map(_.getLong(0)).toSet ==
      (0L until 8L).toSet)
    assert(t.metaRowCount(None).contains(8L))
  }
}
