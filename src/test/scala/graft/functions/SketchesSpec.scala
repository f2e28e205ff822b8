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
}
