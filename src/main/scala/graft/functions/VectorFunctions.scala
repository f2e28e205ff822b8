package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Embedding-vector primitives for similarity search — no UDF, no
  * driver-side math. The hot-path cosine is the native fused-loop
  * expression `graft.catalyst.CosineSim`; the higher-order-function
  * compositions here remain as the reference forms (HOFs are
  * `CodegenFallback` in Spark — distributed but interpreted per row, with
  * an intermediate array per `zip_with`).
  *
  * Determinism contract: all arithmetic is double-precision and the dot
  * product folds left-to-right over the array (Spark `aggregate`; the
  * native expression accumulates in the same order — CosineSimSpec pins
  * bit-equality), which any SQL engine evaluating an ordered list-sum
  * reproduces bit-exactly — the cosine oracle checks rely on this.
  */
object VectorFunctions {

  /** Cast a float array column to double once, up front. */
  def asDouble(a: Column): Column = transform(a, _.cast(DoubleType))

  /** Left-fold dot product; inputs must already be double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Native fused-loop cosine (bit-equal to [[cosineComposed]]); requires
    * `graft.catalyst.CosineSim.register(spark)` once per session —
    * `SimQueries` and `KMeans.fit` register at their entry points.
    */
  def cosine(a: Column, b: Column): Column =
    graft.catalyst.CosineSim.cosine(a, b)

  /** The HOF-composed form — the equivalence witness for the native
    * expression and the shape the DuckDB oracle replays.
    */
  def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Sign-LSH bucket from the first `bits` dimensions: bit d-1 set iff
    * component d > 0. A pure-integer random-hyperplane stand-in (axis-aligned
    * planes) — at scale the bucket id is the shuffle/partition key that turns
    * all-pairs similarity into per-bucket work.
    */
  def signBucket(emb: Column, bits: Int = 8): Column =
    (1 to bits).map { d =>
      when(element_at(emb, d) > 0, lit(1 << (d - 1))).otherwise(lit(0))
    }.reduce(_ + _)
}
