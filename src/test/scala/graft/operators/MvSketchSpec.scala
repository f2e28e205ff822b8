package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.TxLogTable

/** Sketch measures for materialized views, built on the row-local derive
  * machinery: HLL-register COUNT(DISTINCT) views (insert-additive, full
  * recompute on deleting windows — the honest sketch contract) and
  * power-of-2 histogram quantile views (fully additive, incremental
  * under every DML shape), plus generic derived group keys
  * (date_trunc-style rollups) and the derive validation surface.
  */
class MvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("u", LongType),
    StructField("v", DoubleType)))

  private def fresh(tag: String): (TxLogTable, String) = {
    val dir = Files.createTempDirectory(s"mvsk-$tag")
    (TxLogTable(spark, dir.resolve("src").toString),
      dir.resolve("mv").toString)
  }

  private def df(rows: (Long, Long, Double)*): DataFrame =
    rows.toDF("k", "u", "v")

  private def viewRows(mvRoot: String): DataFrame = {
    val d = MaterializedView.definition(spark, mvRoot)
    TxLogTable(spark, mvRoot).snapshot(d.mvSchema)
  }

  // the exact register recompute: per (k, bucket) max rank + row count,
  // the same integer math as Sketches.hllRegisters
  private def registersRecompute(src: TxLogTable): Set[(Long, Long, Long, Long)] = {
    val h = md5(col("u").cast("string"))
    val v = conv(substring(h, 3, 15), 16, 10).cast(LongType)
    val rank = when(v === 0, lit(61L))
      .otherwise(lit(61L) - length(bin(v)).cast(LongType))
    src.snapshot(schema).where(col("u").isNotNull)
      .select(col("k"),
        conv(substring(h, 1, 2), 16, 10).cast(LongType).as("b"),
        rank.as("r"))
      .groupBy("k", "b").agg(max("r").as("mr"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
  }

  test("distinct view: registers fold across appends (incremental), " +
    "equal the exact recompute, and a deleting window target-recomputes " +
    "only the affected registers — still exact, still incremental") {
    val (src, mvRoot) = fresh("hll")
    val r = new scala.util.Random(7)
    src.commit(df((1 to 300).map(i =>
      (i % 3L, r.nextInt(80).toLong, i.toDouble)): _*), overwrite = true)
    MaterializedView.createDistinct(spark, mvRoot, "dv", src, schema,
      Seq("k"), "users" -> "u")
    val got0 = viewRows(mvRoot).collect().map(x => (x.getLong(0),
      x.getLong(1), x.getLong(2),
      x.getAs[Long](MaterializedView.CountCol))).toSet
    assert(got0 === registersRecompute(src))
    // appends fold incrementally: registers are insert-additive
    src.commit(df((1 to 200).map(i =>
      (i % 3L, 80L + r.nextInt(40), i.toDouble)): _*), overwrite = false)
    val st = MaterializedView.refresh(spark, mvRoot)
    assert(st.mode === "incremental", st)
    val got1 = viewRows(mvRoot).collect().map(x => (x.getLong(0),
      x.getLong(1), x.getLong(2),
      x.getAs[Long](MaterializedView.CountCol))).toSet
    assert(got1 === registersRecompute(src))
    // a deleting window cannot FOLD a max register — the refresh
    // re-aggregates exactly the affected (group, bucket) registers
    src.deleteWherePos(schema, col("u") >= 100L)
    val st2 = MaterializedView.refresh(spark, mvRoot)
    assert(st2.mode === "incremental", st2)
    assert(viewRows(mvRoot).collect().map(x => (x.getLong(0),
      x.getLong(1), x.getLong(2),
      x.getAs[Long](MaterializedView.CountCol))).toSet
      === registersRecompute(src))
  }

  test("distinctEstimates is within HLL tolerance of the exact count") {
    val (src, mvRoot) = fresh("est")
    val r = new scala.util.Random(11)
    src.commit(df((1 to 4000).map(i =>
      (i % 2L, r.nextInt(900).toLong, 1.0)): _*), overwrite = true)
    MaterializedView.createDistinct(spark, mvRoot, "dv", src, schema,
      Seq("k"), "users" -> "u")
    val est = MaterializedView.distinctEstimates(spark, mvRoot)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val exact = src.snapshot(schema).groupBy("k")
      .agg(countDistinct(col("u")).as("n")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n) / n < 0.2,
        s"k=$k exact=$n est=${est(k)}")
    }
  }

  test("hist view folds incrementally under append AND delete (fully " +
    "additive), counts equal recompute, quantile read is sane") {
    val (src, mvRoot) = fresh("hist")
    src.commit(df((1 to 500).map(i =>
      (i % 2L, i.toLong, (i * i % 3000).toDouble)): _*), overwrite = true)
    MaterializedView.createHist(spark, mvRoot, "hv", src, schema,
      Seq("k"), "vb" -> "v")
    def recompute(): Set[(Long, Long, Long)] =
      src.snapshot(schema).where(col("v").isNotNull && col("v") >= 0)
        .select(col("k"),
          length(bin(floor(col("v")).cast(LongType))).cast(LongType)
            .as("b"))
        .groupBy("k", "b").agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def got(): Set[(Long, Long, Long)] =
      viewRows(mvRoot).collect().map(x => (x.getLong(0), x.getLong(1),
        x.getAs[Long](MaterializedView.CountCol))).toSet
    assert(got() === recompute())
    src.commit(df((501 to 700).map(i =>
      (i % 2L, i.toLong, (i * 7 % 5000).toDouble)): _*), overwrite = false)
    src.deleteWherePos(schema, col("v") > 2500.0) // delete-dv: exact feed
    val st = MaterializedView.refresh(spark, mvRoot)
    assert(st.mode === "incremental",
      s"histogram counts are fully additive — deletes must fold: $st")
    assert(got() === recompute())
    val q = MaterializedView.histQuantiles(spark, mvRoot, 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exactQ = src.snapshot(schema).where(col("v") >= 0).groupBy("k")
      .agg(expr("percentile(v, 0.5)").as("m")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    exactQ.foreach { case (k, m) =>
      assert(q(k) >= m / 2 - 1 && q(k) <= m * 2 + 1,
        s"k=$k exact=$m est=${q(k)} (±1 power of 2 by contract)")
    }
  }

  test("exact distinct via two-level composition: incremental under " +
    "append AND delete, equal to COUNT(DISTINCT) at every refresh") {
    val (src, mvRoot) = fresh("dex")
    src.commit(df((1 to 200).map(i =>
      (i % 3L, (i % 40).toLong, 1.0)): _*), overwrite = true)
    MaterializedView.createDistinctExact(spark, mvRoot, "dex", src,
      schema, Seq("k"), "u")
    def got(): Map[Long, Long] = {
      val d = MaterializedView.definition(spark, mvRoot)
      TxLogTable(spark, mvRoot).snapshot(d.mvSchema).collect()
        .map(r => r.getLong(0) ->
          r.getAs[Long](MaterializedView.CountCol)).toMap
    }
    def exact(): Map[Long, Long] =
      src.snapshot(schema).where(col("u").isNotNull).groupBy("k")
        .agg(countDistinct(col("u")).as("n")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got() === exact())
    // append: new values raise counts, existing values don't
    src.commit(df((201 to 260).map(i =>
      (i % 3L, (i % 55).toLong, 1.0)): _*), overwrite = false)
    val (i1, o1) = MaterializedView.refreshDistinctExact(spark, mvRoot)
    assert(i1.mode === "incremental" && o1.mode === "incremental",
      s"$i1 / $o1")
    assert(got() === exact())
    // DELETE: the sketch view must recompute here; the exact pair FOLDS
    src.deleteWherePos(schema, col("u") >= 30L)
    val (i2, o2) = MaterializedView.refreshDistinctExact(spark, mvRoot)
    assert(i2.mode === "incremental" && o2.mode === "incremental",
      s"exact distinct must stay incremental under deletes: $i2 / $o2")
    assert(got() === exact())
    // a value fully departing one group but not another is the classic
    // distinct-maintenance trap: covered because the inner's (k, u)
    // count reaches 0 only where the LAST row left
    src.deleteWherePos(schema, col("k") === 1L && col("u") === 5L)
    val (_, o3) = MaterializedView.refreshDistinctExact(spark, mvRoot)
    assert(o3.mode === "incremental")
    assert(got() === exact())
  }

  test("generic derived group key: a bucket rollup folds like any view") {
    val (src, mvRoot) = fresh("roll")
    src.commit(df((1 to 100).map(i =>
      (i.toLong, i % 10L, i.toDouble)): _*), overwrite = true)
    // group by a COMPUTED key (k div 10): the date_trunc rollup shape
    MaterializedView.create(spark, mvRoot, "rv", src, schema,
      Seq("decade"), Seq("total" -> "v"),
      derives = Seq("decade" -> "CAST(k DIV 10 AS BIGINT)"))
    src.commit(df((101 to 130).map(i =>
      (i.toLong, i % 10L, i.toDouble)): _*), overwrite = false)
    val st = MaterializedView.refresh(spark, mvRoot)
    assert(st.mode === "incremental", st)
    val d = MaterializedView.definition(spark, mvRoot)
    val got = TxLogTable(spark, mvRoot).snapshot(d.mvSchema).collect()
      .map(r => (r.getLong(0),
        r.getAs[java.math.BigDecimal]("total").doubleValue(),
        r.getAs[Long](MaterializedView.CountCol))).toSet
    val want = src.snapshot(schema)
      .groupBy((col("k") / 10).cast(LongType).as("decade"))
      .agg(sum(col("v").cast(DecimalType(38, 6))).as("t"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0),
        r.getAs[java.math.BigDecimal]("t").doubleValue(),
        r.getLong(2))).toSet
    assert(got === want)
  }

  test("derives compose with joined views and with filters that read " +
    "them: a cross-side derived key folds incrementally") {
    val dir = Files.createTempDirectory("mvsk-jd")
    val fact = TxLogTable(spark, dir.resolve("fact").toString)
    val dim = TxLogTable(spark, dir.resolve("dim").toString)
    val mvRoot = dir.resolve("mv").toString
    val dimSchema = StructType(Seq(
      StructField("uid", LongType), StructField("w", LongType)))
    fact.commit((1 to 60).map(i => (i.toLong, i % 6L, i.toDouble))
      .toDF("k", "u", "v"), overwrite = true)
    dim.commit((0L to 5L).map(i => (i, i % 2L)).toDF("uid", "w"),
      overwrite = true)
    // derived key combines BOTH sides; the filter reads the derive
    MaterializedView.createJoined(spark, mvRoot, "jd", fact, schema,
      dim, dimSchema, Seq("u" -> "uid"), Seq("bucket"),
      Seq("total" -> "v"), filterExpr = Some("bucket >= 0"),
      derives = Seq("bucket" -> "CAST(k DIV 10 AS BIGINT) + w"))
    def got(): Set[(Long, Double, Long)] = {
      val d = MaterializedView.definition(spark, mvRoot)
      TxLogTable(spark, mvRoot).snapshot(d.mvSchema).collect()
        .map(r => (r.getLong(0),
          r.getAs[java.math.BigDecimal]("total").doubleValue(),
          r.getAs[Long](MaterializedView.CountCol))).toSet
    }
    def want(): Set[(Long, Double, Long)] =
      fact.snapshot(schema).join(dim.snapshot(dimSchema),
          col("u") === col("uid"))
        .select(((col("k") / 10).cast(LongType) + col("w")).as("bucket"),
          col("v"))
        .groupBy("bucket")
        .agg(sum(col("v").cast(DecimalType(38, 6))).as("t"),
          count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0),
          r.getAs[java.math.BigDecimal]("t").doubleValue(),
          r.getLong(2))).toSet
    assert(got() === want())
    fact.commit((61 to 90).map(i => (i.toLong, i % 6L, i.toDouble))
      .toDF("k", "u", "v"), overwrite = false)
    val st = MaterializedView.refresh(spark, mvRoot)
    assert(st.mode === "incremental", st)
    assert(got() === want())
  }

  test("derive validation: shadowing, chaining and delimiter names are " +
    "loud create-time refusals") {
    val (src, mvRoot) = fresh("val")
    src.commit(df((1L, 1L, 1.0)), overwrite = true)
    val e1 = intercept[IllegalArgumentException] {
      MaterializedView.create(spark, mvRoot + "1", "x", src, schema,
        Seq("k"), Seq("t" -> "v"), derives = Seq("u" -> "k + 1"))
    }
    assert(e1.getMessage.contains("shadows a source column"))
    val e2 = intercept[IllegalArgumentException] {
      MaterializedView.create(spark, mvRoot + "2", "x", src, schema,
        Seq("k"), Seq("t" -> "v"),
        derives = Seq("a" -> "k + 1", "b" -> "a + 1"))
    }
    assert(e2.getMessage.contains("derives read source columns only"))
    val e3 = intercept[IllegalArgumentException] {
      MaterializedView.create(spark, mvRoot + "3", "x", src, schema,
        Seq("k"), Seq("t" -> "v"), derives = Seq("a:b" -> "k + 1"))
    }
    assert(e3.getMessage.contains("delimiter-free"))
  }
}
