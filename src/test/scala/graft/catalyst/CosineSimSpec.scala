package graft.catalyst

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.VectorFunctions

/** The native fused-loop cosine must be BIT-equal to the HOF-composed form
  * it replaces (same left-to-right accumulation order), because the DuckDB
  * oracles replay the composed fold — approximate equality would eventually
  * hash-mismatch.
  */
class CosineSimSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bit-equal to the composed form on the real embeddings corpus") {
    CosineSim.register(spark)
    val emb = spark.read
      .parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))
    val q = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val both = emb.crossJoin(broadcast(q)).select(
      VectorFunctions.cosine(col("v"), col("qv")).as("native"),
      VectorFunctions.cosineComposed(col("v"), col("qv")).as("composed"))
    // == on doubles: exact bitwise agreement (NaN would fail, none here)
    assert(both.filter(col("native") =!= col("composed")).isEmpty)
    assert(both.count() > 0)
  }

  test("null semantics match zip_with padding: unequal length, null elem") {
    CosineSim.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0), Array(3.0, 4.0)),          // plain
      (Array(1.0), Array(1.0, 2.0)),               // unequal → null
      (Array(0.0, 0.0), Array(1.0, 2.0)),          // zero vector → null
      (Array.empty[Double], Array.empty[Double])   // empty → null (÷0)
    ).toDF("a", "b")
      .union(Seq((null, Array(1.0))).toDF("a", "b")) // null input → null
    val rows = df.select(
      VectorFunctions.cosine($"a", $"b").as("n"),
      VectorFunctions.cosineComposed($"a", $"b").as("c")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0))
        assert(r.getDouble(0) == r.getDouble(1), r.toString)
    }
    // the interesting cases really are the nulls (incl. Spark's non-ANSI
    // NULL-on-zero-divisor double division, which the native loop mimics)
    assert(rows.count(_.isNullAt(0)) == 4)
  }

  test("element null inside the array propagates to null") {
    CosineSim.register(spark)
    val df = spark.sql(
      "SELECT cosine_sim(array(1.0d, cast(null as double)), array(1.0d, 2.0d)) c")
    assert(df.collect()(0).isNullAt(0))
  }
}
