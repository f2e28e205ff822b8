package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.TxLogTable

/** Write-audit-publish for DERIVED tables: [[MaterializedView.branchMv]]
  * forks a consistent (source, view) branch pair, the view's branch
  * handle refreshes against the source's same-name branch, main stays
  * untouched through the audit, and [[MaterializedView.publishWap]]
  * promotes both with seamless consumed-version bookkeeping (a
  * post-publish main refresh is a noop).
  */
class MvBranchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", DoubleType)))

  private def fresh(): (TxLogTable, String) = {
    val dir = Files.createTempDirectory("mvbr")
    (TxLogTable(spark, dir.resolve("src").toString),
      dir.resolve("mv").toString)
  }

  private def df(rows: (Long, Double)*): DataFrame = rows.toDF("k", "v")

  private def rowsOf(root: String): Set[(Long, Long, Double)] = {
    val d = MaterializedView.definition(spark, root)
    TxLogTable(spark, root).snapshot(d.mvSchema).collect()
      .map(r => (r.getLong(0), r.getAs[Long](MaterializedView.CountCol),
        r.getAs[java.math.BigDecimal]("total").doubleValue())).toSet
  }

  private def recompute(t: TxLogTable): Set[(Long, Long, Double)] =
    t.snapshot(schema).groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(DecimalType(38, 6))).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.math.BigDecimal]("t").doubleValue())).toSet

  test("fork pair, write + refresh on the branch (main untouched), " +
    "publish both: main view matches, post-publish refresh noops") {
    val (src, mvRoot) = fresh()
    src.commit(df((1L, 1.0), (2L, 2.0)), overwrite = true)
    MaterializedView.create(spark, mvRoot, "wap", src, schema,
      Seq("k"), Seq("total" -> "v"))
    val mainBefore = rowsOf(mvRoot)
    val (forkF, _) = MaterializedView.branchMv(spark, mvRoot, "audit")
    assert(forkF == src.latestVersion.get)
    // audit-cadence writes land on the SOURCE branch only
    val bSrc = src.branchTable("audit")
    bSrc.commit(df((1L, 10.0), (3L, 3.0)), overwrite = false)
    val bHandle = TxLogTable.branchRoot(mvRoot, "audit")
    val st = MaterializedView.refresh(spark, bHandle)
    assert(st.mode === "incremental", st)
    // the branch view folded the branch; main saw NOTHING
    assert(rowsOf(bHandle) === recompute(bSrc))
    assert(rowsOf(bHandle) === Set((1L, 2L, 11.0), (2L, 1L, 2.0),
      (3L, 1L, 3.0)))
    assert(rowsOf(mvRoot) === mainBefore)
    assert(recompute(src) !== recompute(bSrc))
    // publish the audited pair: fact then view, bookkeeping rewritten
    val (fPub, vPub) = MaterializedView.publishWap(spark, mvRoot, "audit")
    assert(TxLogTable(spark, mvRoot).latestVersion.contains(vPub))
    assert(src.latestVersion.contains(fPub))
    assert(rowsOf(mvRoot) === recompute(src))
    assert(rowsOf(mvRoot) === Set((1L, 2L, 11.0), (2L, 1L, 2.0),
      (3L, 1L, 3.0)))
    // consumed version points at the published MAIN fact version
    assert(MaterializedView.lastSourceVersion(
      TxLogTable(spark, mvRoot)) === fPub)
    assert(MaterializedView.refresh(spark, mvRoot).mode === "noop")
    // and ordinary maintenance continues on main after the publish
    src.commit(df((2L, 5.0)), overwrite = false)
    assert(MaterializedView.refresh(spark, mvRoot).mode === "incremental")
    assert(rowsOf(mvRoot) === recompute(src))
  }

  test("publish gate: an unrefreshed branch view refuses to publish " +
    "(you audit exactly what will land)") {
    val (src, mvRoot) = fresh()
    src.commit(df((1L, 1.0)), overwrite = true)
    MaterializedView.create(spark, mvRoot, "gate", src, schema,
      Seq("k"), Seq("total" -> "v"))
    MaterializedView.branchMv(spark, mvRoot, "a")
    src.branchTable("a").commit(df((2L, 2.0)), overwrite = false)
    val e = intercept[IllegalArgumentException] {
      MaterializedView.publishWap(spark, mvRoot, "a")
    }
    assert(e.getMessage.contains("refresh the view on the branch"), e)
  }

  test("branchMv refuses a stale view (the forks must correspond), and " +
    "a branch refresh refuses when no matching source branch exists") {
    val (src, mvRoot) = fresh()
    src.commit(df((1L, 1.0)), overwrite = true)
    MaterializedView.create(spark, mvRoot, "st", src, schema,
      Seq("k"), Seq("total" -> "v"))
    src.commit(df((2L, 2.0)), overwrite = false) // view now behind
    val e = intercept[IllegalArgumentException] {
      MaterializedView.branchMv(spark, mvRoot, "b")
    }
    assert(e.getMessage.contains("refresh the view before forking"), e)
    MaterializedView.refresh(spark, mvRoot)
    // a view branch without its source twin is a loud refusal
    TxLogTable(spark, mvRoot).createBranch("solo")
    val e2 = intercept[IllegalArgumentException] {
      MaterializedView.refresh(spark,
        TxLogTable.branchRoot(mvRoot, "solo"))
    }
    assert(e2.getMessage.contains("no matching source branch"), e2)
  }

  test("joined-view WAP: branchMv forks the (fact, dim, view) TRIPLE, " +
    "branch DML on BOTH sides folds on the branch (dim deltas " +
    "included) with main frozen, and publish promotes all three with " +
    "seamless bookkeeping") {
    val dir = Files.createTempDirectory("mvbrj")
    val fact = TxLogTable(spark, dir.resolve("fact").toString)
    val dim = TxLogTable(spark, dir.resolve("dim").toString)
    val mvRoot = dir.resolve("mv").toString
    val dimSchema = StructType(Seq(
      StructField("uid", LongType), StructField("seg", StringType)))
    fact.commit(df((1L, 1.0), (2L, 2.0)), overwrite = true)
    dim.commit(Seq((1L, "a"), (2L, "b"), (3L, "a"))
      .toDF("uid", "seg"), overwrite = true)
    MaterializedView.createJoined(spark, mvRoot, "wapj", fact, schema,
      dim, dimSchema, Seq("k" -> "uid"), Seq("seg"), Seq("total" -> "v"))
    def segOf(root: String): Set[(String, Long, Double)] = {
      val d = MaterializedView.definition(spark, mvRoot)
      TxLogTable(spark, root).snapshot(d.mvSchema).collect()
        .map(r => (r.getString(0),
          r.getAs[Long](MaterializedView.CountCol),
          r.getAs[java.math.BigDecimal]("total").doubleValue())).toSet
    }
    def recomputeJ(f: TxLogTable, dm: TxLogTable)
        : Set[(String, Long, Double)] =
      f.snapshot(schema).join(dm.snapshot(dimSchema),
          col("k") === col("uid"))
        .groupBy("seg").agg(count(lit(1)).as("n"),
          sum(col("v").cast(DecimalType(38, 6))).as("t"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getAs[java.math.BigDecimal]("t").doubleValue())).toSet
    val mainBefore = segOf(mvRoot)
    MaterializedView.branchMv(spark, mvRoot, "a")
    assert(dim.branches().contains("a"), "the dim must fork too")
    val bFact = fact.branchTable("a")
    val bDim = dim.branchTable("a")
    val bHandle = TxLogTable.branchRoot(mvRoot, "a")
    // audit-cadence writes on BOTH branch sides
    bFact.commit(df((3L, 30.0)), overwrite = false)
    bDim.updateWherePos(dimSchema, col("uid") === 2L,
      Seq("seg" -> lit("a"))) // group migration ON THE BRANCH
    val st = MaterializedView.refresh(spark, bHandle)
    assert(st.mode === "incremental",
      s"branch fact delta + branch dim delta must fold: $st")
    assert(segOf(bHandle) === recomputeJ(bFact, bDim))
    assert(segOf(bHandle) === Set(("a", 3L, 33.0)))
    // main saw NOTHING: fact, dim and view all frozen
    assert(segOf(mvRoot) === mainBefore)
    assert(recomputeJ(fact, dim) === mainBefore)
    // publish the audited TRIPLE; bookkeeping lands on main numbering
    val (fPub, vPub) = MaterializedView.publishWap(spark, mvRoot, "a")
    assert(src_eq(fact, fPub) && TxLogTable(spark, mvRoot)
      .latestVersion.contains(vPub))
    assert(segOf(mvRoot) === recomputeJ(fact, dim))
    assert(segOf(mvRoot) === Set(("a", 3L, 33.0)))
    assert(MaterializedView.refresh(spark, mvRoot).mode === "noop")
    // ordinary maintenance continues: dim churn on MAIN now dim-folds
    dim.updateWherePos(dimSchema, col("uid") === 1L,
      Seq("seg" -> lit("z")))
    assert(MaterializedView.refresh(spark, mvRoot).mode === "incremental")
    assert(segOf(mvRoot) === recomputeJ(fact, dim))
  }

  test("2-dim star WAP: branchMv forks the (fact, dim, dim, view) " +
    "4-TUPLE, audit writes land on all branch sides, one publish " +
    "promotes them with per-dim bookkeeping") {
    val dir = Files.createTempDirectory("mvbr2d")
    val fact = TxLogTable(spark, dir.resolve("fact").toString)
    val dimU = TxLogTable(spark, dir.resolve("dimu").toString)
    val dimC = TxLogTable(spark, dir.resolve("dimc").toString)
    val mvRoot = dir.resolve("mv").toString
    val duSchema = StructType(Seq(
      StructField("uid", LongType), StructField("seg", StringType)))
    val dcSchema = StructType(Seq(
      StructField("ckey", StringType), StructField("cls", StringType)))
    val fSchema = StructType(Seq(
      StructField("k", LongType), StructField("cat", StringType),
      StructField("v", DoubleType)))
    fact.commit(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "cat", "v"),
      overwrite = true)
    dimU.commit(Seq((1L, "gold"), (2L, "iron")).toDF("uid", "seg"),
      overwrite = true)
    dimC.commit(Seq(("a", "hot"), ("b", "cold")).toDF("ckey", "cls"),
      overwrite = true)
    MaterializedView.createStar(spark, mvRoot, "wap2d", fact, fSchema,
      Seq((dimU, duSchema, Seq("k" -> "uid")),
        (dimC, dcSchema, Seq("cat" -> "ckey"))),
      Seq("seg", "cls"), Seq("total" -> "v"))
    def stOf(root: String): Set[(String, String, Long, Double)] = {
      val d = MaterializedView.definition(spark, mvRoot)
      TxLogTable(spark, root).snapshot(d.mvSchema).collect()
        .map(r => (r.getString(0), r.getString(1),
          r.getAs[Long](MaterializedView.CountCol),
          r.getAs[java.math.BigDecimal]("total").doubleValue())).toSet
    }
    val mainBefore = stOf(mvRoot)
    MaterializedView.branchMv(spark, mvRoot, "a")
    assert(dimU.branches().contains("a") && dimC.branches().contains("a"),
      "BOTH dims must fork")
    val bHandle = TxLogTable.branchRoot(mvRoot, "a")
    // audit writes on all three branch sides
    fact.branchTable("a").commit(Seq((2L, "a", 10.0))
      .toDF("k", "cat", "v"), overwrite = false)
    dimU.branchTable("a").updateWherePos(duSchema, col("uid") === 1L,
      Seq("seg" -> lit("iron")))
    dimC.branchTable("a").updateWherePos(dcSchema, col("ckey") === "b",
      Seq("cls" -> lit("mild")))
    val st = MaterializedView.refresh(spark, bHandle)
    assert(st.mode === "incremental",
      s"branch fact delta + BOTH branch dim deltas must fold: $st")
    assert(stOf(bHandle) === Set(("iron", "hot", 2L, 11.0),
      ("iron", "mild", 1L, 2.0)))
    assert(stOf(mvRoot) === mainBefore, "main frozen through the audit")
    val (_, vPub) = MaterializedView.publishWap(spark, mvRoot, "a")
    assert(TxLogTable(spark, mvRoot).latestVersion.contains(vPub))
    assert(stOf(mvRoot) === Set(("iron", "hot", 2L, 11.0),
      ("iron", "mild", 1L, 2.0)))
    assert(MaterializedView.refresh(spark, mvRoot).mode === "noop",
      "post-publish bookkeeping must be seamless for BOTH dim pins")
  }

  private def src_eq(t: TxLogTable, v: Int): Boolean =
    t.latestVersion.contains(v)

  test("publish is head-conditional on the audited branch: a writer " +
    "racing a branch fact commit between audit and publish gets a loud " +
    "refusal — unaudited rows never ship") {
    val (src, mvRoot) = fresh()
    src.commit(df((1L, 1.0)), overwrite = true)
    MaterializedView.create(spark, mvRoot, "race", src, schema,
      Seq("k"), Seq("total" -> "v"))
    MaterializedView.branchMv(spark, mvRoot, "a")
    val bSrc = src.branchTable("a")
    bSrc.commit(df((2L, 2.0)), overwrite = false)
    MaterializedView.refresh(spark, TxLogTable.branchRoot(mvRoot, "a"))
    val mainBefore = rowsOf(mvRoot)
    val mainFactV = src.latestVersion.get
    MaterializedView.betweenAuditAndPublishHook = () =>
      bSrc.commit(df((666L, 6.66)), overwrite = false) // UNAUDITED
    try {
      val e = intercept[TxLogTable.ConcurrentHeadMoved] {
        MaterializedView.publishWap(spark, mvRoot, "a")
      }
      assert(e.getMessage.contains("past the audited"), e)
    } finally MaterializedView.betweenAuditAndPublishHook = () => ()
    // NOTHING published: main fact and main view are untouched
    assert(src.latestVersion.contains(mainFactV))
    assert(rowsOf(mvRoot) === mainBefore)
    assert(!rowsOf(mvRoot).exists(_._1 == 666L))
    // re-audit (refresh absorbs the racer's row) and publish cleanly
    MaterializedView.refresh(spark, TxLogTable.branchRoot(mvRoot, "a"))
    MaterializedView.publishWap(spark, mvRoot, "a")
    assert(rowsOf(mvRoot) === recompute(src))
    assert(rowsOf(mvRoot).exists(_._1 == 666L))
  }

  test("view-side head race: the fact publishes, the racing view head " +
    "refuses, and the documented safe window self-heals by an ordinary " +
    "main refresh") {
    val (src, mvRoot) = fresh()
    src.commit(df((1L, 1.0)), overwrite = true)
    MaterializedView.create(spark, mvRoot, "race2", src, schema,
      Seq("k"), Seq("total" -> "v"))
    MaterializedView.branchMv(spark, mvRoot, "a")
    val bSrc = src.branchTable("a")
    bSrc.commit(df((2L, 2.0)), overwrite = false)
    val bHandle = TxLogTable.branchRoot(mvRoot, "a")
    MaterializedView.refresh(spark, bHandle)
    val d = MaterializedView.definition(spark, mvRoot)
    val mainFactBefore = src.latestVersion.get
    // the racer moves ONLY the branch view's head (content-preserving
    // compact — any commit counts against the audited pin)
    MaterializedView.betweenAuditAndPublishHook = () =>
      TxLogTable(spark, mvRoot).branchTable("a").compact(d.mvSchema)
    try {
      intercept[TxLogTable.ConcurrentHeadMoved] {
        MaterializedView.publishWap(spark, mvRoot, "a")
      }
    } finally MaterializedView.betweenAuditAndPublishHook = () => ()
    // the fact publish LANDED (fact-then-view order); the main view is
    // merely behind a published window — one ordinary refresh heals it
    assert(src.latestVersion.get > mainFactBefore)
    assert(MaterializedView.refresh(spark, mvRoot).mode === "incremental")
    assert(rowsOf(mvRoot) === recompute(src))
  }

  test("mid-audit main refresh keeps fast-forward honesty: the view " +
    "publish refuses, and the self-heal path is an ordinary refresh") {
    val (src, mvRoot) = fresh()
    src.commit(df((1L, 1.0)), overwrite = true)
    MaterializedView.create(spark, mvRoot, "ff", src, schema,
      Seq("k"), Seq("total" -> "v"))
    MaterializedView.branchMv(spark, mvRoot, "a")
    src.branchTable("a").commit(df((3L, 3.0)), overwrite = false)
    MaterializedView.refresh(spark, TxLogTable.branchRoot(mvRoot, "a"))
    // main moves underneath the audit: the pair no longer fast-forwards
    src.commit(df((9L, 9.0)), overwrite = false)
    MaterializedView.refresh(spark, mvRoot)
    intercept[java.util.ConcurrentModificationException] {
      MaterializedView.publishWap(spark, mvRoot, "a")
    }
    // main is still exact on its own history
    assert(rowsOf(mvRoot) === recompute(src))
  }
}
