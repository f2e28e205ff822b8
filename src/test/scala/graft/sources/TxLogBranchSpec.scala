package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Writable branches + write-audit-publish: fork by name, run any write
  * path against the branch (shared data dir, own manifest log), audit in
  * isolation, fast-forward publish onto main as one atomic commit —
  * refusing if main moved since the fork. Vacuum floors at branch
  * references; dropping the branch releases them.
  */
class TxLogBranchSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.brcat", "graft.sources.v2.TxLogCatalog")
    s.conf.set("spark.sql.catalog.brcat.warehouse",
      Files.createTempDirectory("brcat-wh").toString)
    s
  }
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def fresh(): TxLogTable =
    TxLogTable(spark,
      Files.createTempDirectory("txbr").resolve("t").toString)

  private def rows(t: TxLogTable): Set[(Long, String)] =
    t.snapshot(schema).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("branch writes are invisible on main; branch sees fork + writes") {
    val t = fresh()
    t.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), overwrite = true)
    val fork = t.createBranch("audit")
    assert(fork == 0 && t.branches() == Seq("audit"))
    val bt = t.branchTable("audit")
    assert(bt.forkedFrom.contains(0))
    bt.commit(Seq((3L, "c")).toDF("id", "v"), overwrite = false)
    bt.deleteWhere(schema, col("id") === 1L)
    assert(rows(t) == Set((1L, "a"), (2L, "b")),
      "main must not see branch commits")
    assert(rows(bt) == Set((2L, "b"), (3L, "c")))
    // main keeps committing independently of the branch
    t.commit(Seq((9L, "z")).toDF("id", "v"), overwrite = false)
    assert(rows(bt) == Set((2L, "b"), (3L, "c")),
      "branch must not see main commits after the fork")
  }

  test("fast-forward publish lands the branch head as one main commit") {
    val t = fresh()
    t.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), overwrite = true)
    val bt0 = {
      t.createBranch("wap"); t.branchTable("wap")
    }
    bt0.commit(Seq((3L, "c")).toDF("id", "v"), overwrite = false)
    bt0.deleteWhere(schema, col("id") === 2L)
    val pv = t.publishBranch("wap")
    assert(pv == 1 && t.opOf(1).contains("publish"))
    assert(rows(t) == Set((1L, "a"), (3L, "c")))
    // publish is metadata-only: no data file was copied or rewritten —
    // main's new manifest references the branch's staged files directly
    assert(t.entries(Some(1)).map(_.rel).toSet ==
      bt0.entries(None).map(_.rel).toSet)
  }

  test("publish refuses when main moved since the fork") {
    val t = fresh()
    t.commit(Seq((1L, "a")).toDF("id", "v"), overwrite = true)
    t.createBranch("late")
    val bt = t.branchTable("late")
    bt.commit(Seq((2L, "b")).toDF("id", "v"), overwrite = false)
    t.commit(Seq((9L, "z")).toDF("id", "v"), overwrite = false) // main moves
    val e = intercept[java.util.ConcurrentModificationException](
      t.publishBranch("late"))
    assert(e.getMessage.contains("re-branch"))
    assert(rows(t) == Set((1L, "a"), (9L, "z")), "main untouched")
  }

  test("vacuum floors at branch references; drop_branch releases them") {
    val t = fresh()
    t.commit(Seq((1L, "a")).toDF("id", "v"), overwrite = true)
    t.createBranch("hold")
    val bt = t.branchTable("hold")
    bt.commit(Seq((2L, "b")).toDF("id", "v"), overwrite = false)
    val branchOnly = bt.entries(None).map(_.rel).toSet --
      t.entries(None).map(_.rel).toSet
    assert(branchOnly.nonEmpty)
    // main overwrites, then vacuums aggressively — the branch's files
    // must survive (they are references like main's own)
    t.commit(Seq((9L, "z")).toDF("id", "v"), overwrite = true)
    t.vacuum(keep = 1, minAgeMillis = 0, retainMillis = 0)
    branchOnly.foreach { rel =>
      assert(Files.exists(Paths.get(t.root, "data", rel)),
        s"vacuum must not reclaim branch-referenced $rel")
    }
    assert(rows(bt) == Set((1L, "a"), (2L, "b")), "branch still reads")
    // vacuum on a branch handle is refused — it walks the SHARED data dir
    val e = intercept[IllegalArgumentException](
      bt.vacuum(1, 0, 0))
    assert(e.getMessage.contains("MAIN"))
    // dropping the branch releases its references
    assert(t.dropBranch("hold"))
    t.vacuum(keep = 1, minAgeMillis = 0, retainMillis = 0)
    branchOnly.foreach { rel =>
      assert(!Files.exists(Paths.get(t.root, "data", rel)),
        s"dropped branch's $rel must be reclaimable")
    }
  }

  test("streaming change feed runs against a branch — main commits " +
    "invisible, branch commits exactly-once") {
    val t = fresh()
    t.commit(Seq((1L, "a")).toDF("id", "v"), overwrite = true)
    t.createBranch("feed")
    val bt = t.branchTable("feed")
    // the branch root IS a stream source root: the change feed reads the
    // branch log (initial snapshot = fork content) with zero plumbing
    val q = spark.readStream.format("txlog").schema(schema).load(bt.root)
      .writeStream.format("memory").queryName("branch_feed")
      .option("checkpointLocation",
        Files.createTempDirectory("txbr-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("branch_feed").collect()
        .map(_.getLong(0)).toSet == Set(1L))
      bt.commit(Seq((2L, "b")).toDF("id", "v"), overwrite = false)
      t.commit(Seq((9L, "z")).toDF("id", "v"), overwrite = false) // main
      q.processAllAvailable()
      val got = spark.table("branch_feed").collect().map(_.getLong(0))
      assert(got.toSet == Set(1L, 2L) && got.length == 2,
        "the feed sees branch commits exactly once and never main's")
    } finally q.stop()
  }

  test("branch name and lifecycle validation") {
    val t = fresh()
    t.commit(Seq((1L, "a")).toDF("id", "v"), overwrite = true)
    intercept[IllegalArgumentException](t.createBranch("has space"))
    intercept[IllegalArgumentException](t.createBranch("7"))
    intercept[IllegalArgumentException](t.createBranch("main"))
    t.createBranch("x")
    intercept[IllegalArgumentException](t.createBranch("x"))
    val bt = t.branchTable("x")
    intercept[IllegalArgumentException](bt.createBranch("nested"))
    assert(!t.dropBranch("never-existed"))
  }

  test("SQL surface: CALL branch / branch_<name> ident / publish") {
    spark.sql("DROP TABLE IF EXISTS brcat.db.ev")
    spark.sql("CREATE TABLE brcat.db.ev (id BIGINT, v STRING) USING txlog")
    spark.sql("INSERT INTO brcat.db.ev VALUES (1, 'a'), (2, 'b')")
    val br = spark.sql("CALL brcat.system.branch('db.ev', 'audit')").head
    assert(br.getString(0) == "audit" && br.getInt(1) == 1)
    // write to the branch through its identifier; audit there
    spark.sql("INSERT INTO brcat.db.ev.branch_audit VALUES (3, 'c')")
    spark.sql("DELETE FROM brcat.db.ev.branch_audit WHERE id = 1")
    assert(spark.sql("SELECT * FROM brcat.db.ev").count() == 2,
      "main unchanged while the branch is audited")
    val audit = spark.sql(
      "SELECT id, v FROM brcat.db.ev.branch_audit ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(audit == Seq((2L, "b"), (3L, "c")))
    val ls = spark.sql("CALL brcat.system.branches('db.ev')").collect()
    assert(ls.map(_.getString(0)).toSeq == Seq("audit"))
    val pv = spark.sql("CALL brcat.system.publish('db.ev', 'audit')")
      .head.getInt(0)
    assert(pv >= 2)
    val main = spark.sql("SELECT id, v FROM brcat.db.ev ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(main == Seq((2L, "b"), (3L, "c")), "publish lands the audit")
    assert(spark.sql("CALL brcat.system.drop_branch('db.ev', 'audit')")
      .head.getBoolean(0))
    intercept[Exception](
      spark.sql("SELECT * FROM brcat.db.ev.branch_audit").collect())
  }
}
