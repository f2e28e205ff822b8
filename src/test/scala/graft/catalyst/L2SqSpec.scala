package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.VectorFunctions

/** The native fused-loop squared L2 must be BIT-equal to the HOF-composed
  * form it replaces (same left-to-right accumulation order), because the
  * DuckDB oracles replay the composed fold — approximate equality would
  * eventually hash-mismatch.
  */
class L2SqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def composed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  test("bit-equal to the composed form on the real embeddings corpus") {
    L2Sq.register(spark)
    val emb = spark.read
      .parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))
    val q = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val both = emb.crossJoin(broadcast(q)).select(
      L2Sq.l2sq(col("v"), col("qv")).as("native"),
      composed(col("v"), col("qv")).as("composed"))
    assert(both.filter(col("native") =!= col("composed")).isEmpty)
    assert(both.count() > 0)
  }

  test("null semantics match zip_with padding; empty arrays fold to 0.0") {
    L2Sq.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0), Array(3.0, 5.0)),          // plain → 13.0
      (Array(1.0), Array(1.0, 2.0)),               // unequal → null
      (Array.empty[Double], Array.empty[Double])   // empty → 0.0 (init)
    ).toDF("a", "b")
      .union(Seq((null, Array(1.0))).toDF("a", "b")) // null input → null
    val rows = df.select(
      L2Sq.l2sq($"a", $"b").as("n"),
      composed($"a", $"b").as("c")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0))
        assert(r.getDouble(0) == r.getDouble(1), r.toString)
    }
    assert(rows.count(_.isNullAt(0)) == 2)
  }

  test("element null inside the array propagates to null") {
    L2Sq.register(spark)
    val df = spark.sql(
      "SELECT l2_sq(array(1.0d, cast(null as double)), array(1.0d, 2.0d)) c")
    assert(df.collect()(0).isNullAt(0))
  }
}
