package graft.functions

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Distinct-count sketches: estimate accuracy on known cardinalities,
  * merge laws (the property that makes them 100 TB-usable: shard sketches
  * combine into the corpus sketch without re-reading data), and exactness
  * of KMV below k.
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("HLL estimate lands within the sketch's error band") {
    // 256 buckets → standard error ~6.5%; allow 3σ ≈ 20%
    for (n <- Seq(500, 5000, 50000)) {
      val df = spark.range(n).select(col("id"))
      val est = Sketches.hllEstimate(Sketches.hllRegisters(df, col("id")))
      assert(math.abs(est - n) / n < 0.20, s"n=$n est=$est")
    }
  }

  test("HLL registers merge by per-bucket max (shard ≡ corpus)") {
    val whole = spark.range(20000).select(col("id"))
    val a = Sketches.hllRegisters(
      whole.filter(col("id") % 2 === 0), col("id"))
    val b = Sketches.hllRegisters(
      whole.filter(col("id") % 2 === 1), col("id"))
    val merged = a.unionByName(b).groupBy("bucket")
      .agg(org.apache.spark.sql.functions.max("r").as("r"))
    val direct = Sketches.hllRegisters(whole, col("id"))
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }

  test("KMV is exact below k and within band above it") {
    val small = spark.range(40).select(col("id"))
    assert(Sketches.kmvEstimate(Sketches.kmvMinima(small, col("id"))) == 40.0)
    val big = spark.range(5000).select(col("id"))
    val est = Sketches.kmvEstimate(Sketches.kmvMinima(big, col("id")))
    // k=64 → standard error ~1/sqrt(62) ≈ 12.7%; allow 3σ
    assert(math.abs(est - 5000) / 5000 < 0.40, s"est=$est")
  }

  test("KMV minima merge by union + re-take (shard ≡ corpus)") {
    val whole = spark.range(3000).select(col("id"))
    val a = Sketches.kmvMinima(whole.filter(col("id") < 1500), col("id"))
    val b = Sketches.kmvMinima(whole.filter(col("id") >= 1500), col("id"))
    val merged = a.unionByName(b).distinct().orderBy(col("h")).limit(64)
      .collect().map(_.getString(0)).toSeq
    val direct = Sketches.kmvMinima(whole, col("id"))
      .collect().map(_.getString(0)).toSeq
    assert(merged == direct)
  }

  test("pow2 histogram quantiles land within their 2x band") {
    import spark.implicits._
    val vals = (1 to 10000).map(i => i.toDouble)
    val df = vals.toDF("v")
    val hist = Sketches.histPow2(df, col("v"))
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val exact = vals((q * vals.size).toInt - 1)
      val est = Sketches.histQuantile(hist, q)
      assert(est >= exact / 2 && est <= exact * 2, s"q=$q est=$est vs $exact")
    }
  }

  test("pow2 histograms merge by adding counts (shard ≡ corpus)") {
    import spark.implicits._
    val whole = (1 to 5000).map(_.toDouble).toDF("v")
    val a = Sketches.histPow2(whole.filter(col("v") <= 2500), col("v"))
    val b = Sketches.histPow2(whole.filter(col("v") > 2500), col("v"))
    val merged = a.unionByName(b).groupBy("bucket")
      .agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
    val direct = Sketches.histPow2(whole, col("v"))
    assert(merged.exceptAll(direct).isEmpty &&
      direct.exceptAll(merged).isEmpty)
  }

  test("hash-sampled quantiles land near exact; samples merge by union") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = spark.range(20000).select(col("id"),
      (col("id") % 1000).cast("double").as("v"))
    def keep(c: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(lit("qs:"), c.cast("string"))), 1, 6),
        16, 10).cast("long") % 100 < 5
    val sample = df.filter(keep(col("id")))
    val est = sample.agg(
      expr("percentile(v, 0.5)")).head().getDouble(0)
    val exact = df.agg(expr("percentile(v, 0.5)")).head().getDouble(0)
    // v is uniform on [0, 1000): a 5% deterministic sample's median
    // should land well within 10% of the true median
    assert(math.abs(est - exact) <= 100.0, s"est $est vs exact $exact")
    // merge law: the sample of a union IS the union of the samples —
    // the per-row hash decision doesn't depend on which shard saw the row
    val (a, b) = (df.filter(col("id") < 10000), df.filter(col("id") >= 10000))
    val merged = a.filter(keep(col("id")))
      .unionByName(b.filter(keep(col("id"))))
    assert(merged.count() == sample.count())
    assert(merged.agg(expr("percentile(v, 0.5)")).head().getDouble(0) == est)
  }

  test("nulls contribute nothing to either sketch") {
    import spark.implicits._
    val df = Seq(Some(1L), None, Some(2L), None).toDF("id")
    val regs = Sketches.hllRegisters(df, col("id")).collect()
    assert(regs.length == 2) // two distinct values, two buckets (or fewer)
    val kmv = Sketches.kmvMinima(df, col("id")).collect()
    assert(kmv.length == 2)
  }

  test("count-min never under-counts and bounds the over-count") {
    import spark.implicits._
    // skewed multiset: value v appears v times, v in 1..60 (N = 1830)
    val df = (1 to 60).flatMap(v => Seq.fill(v)(v.toLong)).toDF("id")
    val sk = Sketches.cmSketch(df, col("id"))
    val n = 1830L
    (1 to 60).foreach { v =>
      val est = Sketches.cmsEstimate(sk, v.toString)
      assert(est >= v, s"CMS under-counted $v: $est")
      // d=4 independent rows each within 2N/w except with prob 1/2 each
      // → the min exceeding 2N/w has prob ~2^-4 per item; with 60 items
      // a couple of stragglers are possible, so assert the LOOSER bound
      // every row obeys deterministically: est ≤ N
      assert(est <= n)
    }
    // aggregate accuracy: mean absolute over-count stays near 2N/w
    val overs = (1 to 60).map(v => Sketches.cmsEstimate(sk, v.toString) - v)
    assert(overs.sum.toDouble / 60 <= 4.0 * 2 * n / Sketches.CmsWidth,
      s"mean over-count ${overs.sum / 60.0} way past the ε-bound")
    // a value never seen estimates 0 unless it collides everywhere
    assert(Sketches.cmsEstimate(sk, "absent-key") <= 2 * n / 256)
  }

  test("count-min sketches merge by adding counters (shard ≡ corpus)") {
    val whole = spark.range(5000).select((col("id") % 37).as("id"))
    val a = Sketches.cmSketch(whole.filter(col("id") % 2 === 0), col("id"))
    val b = Sketches.cmSketch(whole.filter(col("id") % 2 === 1), col("id"))
    val merged = a.unionByName(b).groupBy("i", "bucket")
      .agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
    val direct = Sketches.cmSketch(whole, col("id"))
    assert(merged.exceptAll(direct).isEmpty &&
      direct.exceptAll(merged).isEmpty)
  }

  test("count-min heavy hitters have no false negatives") {
    import spark.implicits._
    // 3 heavy values (500 each), 200 light values (3 each)
    val heavy = Seq("alpha", "beta", "gamma").flatMap(Seq.fill(500)(_))
    val light = (1 to 200).flatMap(i => Seq.fill(3)(s"light-$i"))
    val df = (heavy ++ light).toDF("v")
    val sk = Sketches.cmSketch(df, col("v"))
    val hits = Sketches.cmsHeavyHitters(df, col("v"), sk, minCount = 400L)
      .collect().map(_.getString(0)).toSet
    // never-under-count ⇒ every true heavy hitter survives the filter
    assert(Set("alpha", "beta", "gamma").subsetOf(hits), hits.toString)
    // light values estimate ≤ 3 + over-count; none can reach 400 unless
    // it collides with a heavy value in ALL 4 rows — astronomically
    // unlikely at w=256 and spec-deterministic (fixed md5 buckets)
    assert(hits.size <= 4, s"false positives flooded in: $hits")
  }
}
