package graft.sources

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Merge-on-read equality deletes: O(delta) commit (zero data files
  * rewritten), sequence-aware masking (re-inserted keys survive),
  * metadata-aggregate guards, no resurrection through COW rewrites,
  * tombstone lifetime (carried by appends, cleared by compaction,
  * protected from vacuum), and key-set immutability.
  */
class TxLogMorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def fresh(): TxLogTable =
    TxLogTable(spark,
      java.nio.file.Files.createTempDirectory("txmor").resolve("t").toString)

  private def rows(t: TxLogTable): Set[(Long, String)] =
    t.snapshot(schema).collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("changesWithDeletes survives an in-range compaction folding " +
      "the tombstones") {
    val t = fresh()
    t.commit(Seq((1L, "a"), (2L, "b"), (10L, "x")).toDF("id", "v"),
      overwrite = true)                                   // v0
    t.deleteByKeysMor(Seq(10L).toDF("id"))                // v1: tombstone
    t.commit(Seq((3L, "c")).toDF("id", "v"), overwrite = false) // v2
    t.compact(schema)                                     // v3: folds v1
    assert(t.tombstonesOf(t.latestVersion.get).isEmpty,
      "compaction must fold the tombstone (precondition)")
    // the feed over (0, 3] must STILL carry the delete event: the
    // tombstone lives in manifests v1..v2 even though v3 dropped it
    val feed = t.changesWithDeletes(schema, 0, t.latestVersion.get,
        skipRewrites = true)
      .collect().map(r => (r.getString(3), r.getLong(0))).toSet
    assert(feed == Set(("delete", 10L), ("insert", 3L)),
      s"folded tombstone lost from the feed: $feed")
  }

  test("CDC feed property: window folds reconstruct the snapshot " +
      "under random merge/delete/compact/restore mixes") {
    // THE consistency contract of the change feed: cut history at any
    // points, apply each window's events in commit order to keyed
    // state, and the final state equals the table. The mix covers every
    // row-changing shape the feed handles: merge (COW content diff —
    // delete(old)+insert(new), carried rows silent), MOR deletes
    // (keys-only tombstone events), COW predicate deletes (full-row
    // diff deletes, no key declaration needed), and compaction (must be
    // invisible). Only full `overwrite` remains a documented reset
    // boundary. Within a version deletes apply before inserts — the
    // consumer contract a COW update's paired events require.
    val rnd = new scala.util.Random(1107L)
    for (trial <- 1 to 3) {
      val t = fresh()
      t.commit(Seq((1L, "seed")).toDF("id", "v"), overwrite = true)
      (1 to 10).foreach { _ =>
        rnd.nextInt(6) match {
          case 0 | 1 =>
            val rows = (1 to 1 + rnd.nextInt(3))
              .map(_ => (rnd.nextInt(8).toLong, s"m${rnd.nextInt(100)}"))
              .distinctBy(_._1).toList
            t.merge(schema, rows.toDF("id", "v"), Seq("id"))
          case 2 =>
            t.deleteByKeysMor(
              Seq(rnd.nextInt(8).toLong).toDF("id"))
          case 3 => t.compact(schema, 2)
          case 4 =>
            t.deleteWhere(schema, col("id") === rnd.nextInt(8).toLong)
          case 5 => // rollback to any surviving version: exact undo diff
            val vs = t.versions
            t.restore(vs(rnd.nextInt(vs.size)))
        }
      }
      // random contiguous windows covering (-1, latest]
      val latest = t.latestVersion.get
      val cuts = (-1 +: (1 to 3).map(_ => rnd.nextInt(latest + 1))
        .sorted :+ latest).distinct
      var state = Map.empty[Long, String]
      cuts.sliding(2).foreach {
        case Seq(a, b) if a < b =>
          val events = t.changesWithDeletes(schema, a, b,
              skipRewrites = true)
            .collect()
            // commit order; within a version deletes first ('delete' <
            // 'insert' lexically) — a COW update pairs both under one
            // version and the insert must win
            .sortBy(r => (r.getLong(2), r.getString(3)))
          events.foreach { r =>
            if (r.getString(3) == "insert")
              state += (r.getLong(0) -> r.getString(1))
            else state -= r.getLong(0)
          }
        case _ => ()
      }
      assert(state.toSet == rows(t),
        s"trial $trial: feed fold diverged from snapshot " +
          s"(cuts $cuts): $state vs ${rows(t)}")
    }
  }

  test("MOR delete hides keys without rewriting any data file") {
    val t = fresh()
    t.commit((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"),
      overwrite = true)
    val files = t.fileCount()
    val v = t.deleteByKeysMor(Seq(2L, 4L).toDF("id"))
    assert(v == 1 && t.fileCount() == files) // zero rewrite
    assert(rows(t).map(_._1) == (1L to 10L).toSet -- Set(2L, 4L))
    // time travel: the pre-delete version still shows everything
    assert(t.snapshot(schema, Some(0)).count() == 10)
    // metadata aggregates refuse to answer over hidden rows
    assert(t.metaRowCount().isEmpty && t.metaMinMax("id").isEmpty)
  }

  test("re-inserted key survives a prior MOR delete (sequence-aware)") {
    val t = fresh()
    t.commit((1L to 5L).map(i => (i, "old")).toDF("id", "v"),
      overwrite = true)
    t.deleteByKeysMor(Seq(3L).toDF("id"))
    t.commit(Seq((3L, "new")).toDF("id", "v"), overwrite = false)
    assert(rows(t) == Set((1L, "old"), (2L, "old"), (4L, "old"),
      (5L, "old"), (3L, "new")))
    // range/pred scans go through the same mask
    assert(t.snapshotRange(schema, "id", 3L, 3L).collect()
      .map(_.getString(1)).toSeq == Seq("new"))
    assert(t.snapshotWhere(schema, col("id") === 3L).collect()
      .map(_.getString(1)).toSeq == Seq("new"))
  }

  test("COW merge rewrite does not resurrect MOR-deleted rows") {
    val t = fresh()
    t.commit((1L to 8L).map(i => (i, "old")).toDF("id", "v"),
      overwrite = true)
    t.deleteByKeysMor(Seq(5L).toDF("id"))
    // merge on a DIFFERENT key rewrites the file(s) holding id=5 too
    t.merge(schema, Seq((6L, "merged")).toDF("id", "v"), Seq("id"))
    assert(!rows(t).exists(_._1 == 5L), "deleted row resurrected by merge")
    assert(rows(t).contains((6L, "merged")))
  }

  test("compaction materializes deletes and clears tombstones") {
    val t = fresh()
    t.commit((1L to 6L).map(i => (i, "x")).toDF("id", "v"), overwrite = true)
    t.deleteByKeysMor(Seq(1L, 6L).toDF("id"))
    assert(t.tombstonesOf(t.latestVersion.get).nonEmpty)
    t.compact(schema, numFiles = 1)
    assert(t.tombstonesOf(t.latestVersion.get).isEmpty)
    assert(rows(t).map(_._1) == Set(2L, 3L, 4L, 5L))
    // manifest aggregates answer again once tombstones are gone
    assert(t.metaRowCount().contains(4L))
  }

  test("vacuum never deletes a live tombstone file") {
    val t = fresh()
    t.commit((1L to 4L).map(i => (i, "x")).toDF("id", "v"), overwrite = true)
    t.deleteByKeysMor(Seq(2L).toDF("id"))
    t.commit(Seq((9L, "y")).toDF("id", "v"), overwrite = false)
    t.vacuum(keep = 1, minAgeMillis = 0, retainMillis = 0)
    assert(rows(t).map(_._1) == Set(1L, 3L, 4L, 9L))
  }

  test("MOR key set is fixed at first delete") {
    val t = fresh()
    t.commit(Seq((1L, "x")).toDF("id", "v"), overwrite = true)
    t.deleteByKeysMor(Seq(1L).toDF("id"))
    intercept[IllegalArgumentException] {
      t.deleteByKeysMor(Seq("x").toDF("v"))
    }
  }

  test("CDC feed diffs COW deletes/merges: full-row deletes, no phantom " +
      "re-inserts of carried rows") {
    val t = fresh()
    t.commit((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"),
      overwrite = true)                                          // v0
    t.deleteWhere(schema, col("id") <= 3L)                       // v1 COW
    val feed1 = t.changesWithDeletes(schema, 0, 1).collect()
    val d1 = feed1.filter(_.getString(3) == "delete")
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(d1 == Set((1L, "v1"), (2L, "v2"), (3L, "v3")), s"got $d1")
    // the rewritten file carries rows 4..10 — they must NOT re-arrive
    assert(!feed1.exists(_.getString(3) == "insert"),
      "carried rows of a rewritten file re-delivered as phantom inserts")
    // COW merge: update one key, insert a new one → paired events under
    // one version (delete of the pre-image, insert of the post-image)
    t.merge(schema, Seq((5L, "upd"), (20L, "new")).toDF("id", "v"),
      Seq("id"))                                                 // v2
    val feed2 = t.changesWithDeletes(schema, 1, 2).collect()
    val d2 = feed2.filter(_.getString(3) == "delete")
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val i2 = feed2.filter(_.getString(3) == "insert")
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(d2 == Set((5L, "v5")), s"got $d2")
    assert(i2 == Set((5L, "upd"), (20L, "new")), s"got $i2")
    assert(feed2.forall(r =>
      r.getLong(r.fieldIndex("_commit_version")) == 2L))
  }

  test("COW rewrite emits no phantom delete for a MOR-deleted then " +
      "re-inserted key") {
    val t = fresh()
    t.commit((1L to 8L).map(i => (i, "old")).toDF("id", "v"),
      overwrite = true)                    // v0: one file holding 1..8
    t.deleteByKeysMor(Seq(3L).toDF("id")) // v1: tombstone for 3
    t.commit(Seq((3L, "new")).toDF("id", "v"), overwrite = false) // v2
    t.deleteWhere(schema, col("id") === 7L) // v3: rewrites v0's file only
    // the dropped file still physically holds (3,"old"), but it was
    // MOR-masked at v2 — a raw diff would emit delete(3) and kill the
    // re-inserted live key in any keyed consumer; the masked diff must
    // surface ONLY the real delete
    val d = t.changesWithDeletes(schema, 2, 3).collect()
      .filter(_.getString(3) == "delete")
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(d == Set((7L, "old")), s"phantom deletes leaked: $d")
    // end-to-end: folding the FULL feed reproduces the snapshot
    var state = Map.empty[Long, String]
    t.changesWithDeletes(schema, -1, t.latestVersion.get).collect()
      .sortBy(r => (r.getLong(2), r.getString(3)))
      .foreach { r =>
        if (r.getString(3) == "insert")
          state += (r.getLong(0) -> r.getString(1))
        else state -= r.getLong(0)
      }
    assert(state.toSet == rows(t), s"fold diverged: $state vs ${rows(t)}")
  }

  test("CDC feed rolls a restore back as exact undo events") {
    val t = fresh()
    t.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      overwrite = true)                                 // v0
    t.commit(Seq((3L, "c")).toDF("id", "v"), overwrite = false) // v1
    t.deleteWhere(schema, col("id") === 1L)             // v2: the bad commit
    t.restore(1)                                        // v3: undo it
    val feed = t.changesWithDeletes(schema, 2, 3).collect()
    val ins = feed.filter(_.getString(3) == "insert")
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val del = feed.filter(_.getString(3) == "delete")
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // the undo window re-inserts exactly what the bad delete removed —
    // carried rows of the un-rewritten file stay silent
    assert(ins == Set((1L, "a")), s"got $ins")
    assert(del.isEmpty, s"phantom deletes from the restore: $del")
    // full-feed fold lands on the restored snapshot
    var state = Map.empty[Long, String]
    t.changesWithDeletes(schema, -1, t.latestVersion.get).collect()
      .sortBy(r => (r.getLong(2), r.getString(3)))
      .foreach { r =>
        if (r.getString(3) == "insert")
          state += (r.getLong(0) -> r.getString(1))
        else state -= r.getLong(0)
      }
    assert(state.toSet == rows(t), s"fold diverged: $state vs ${rows(t)}")
  }
}
