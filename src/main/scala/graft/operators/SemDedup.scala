package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Semantic deduplication (SemDeDup-style) over an embedding column: a
  * vector is a semantic duplicate iff some LOWER-id vector in its k-means
  * cluster sits at cosine ≥ τ — the deterministic keep-first rule.
  *
  * The TRAINED k-means clusters are the blocking key: pairs only form
  * inside a cluster, so cluster id is the one shuffle key and there is no
  * all-pairs term. Per-cluster work is O(cell²), which makes the CELL SIZE
  * (not k) the scale invariant — [[apply]] derives k = ⌈rows/targetCell⌉,
  * so a 10× corpus gets ~10× the clusters at a ~constant per-cluster cost
  * (the `ScaleProbe semdedup` pins that flatness), exactly how the IVF
  * quantizer scales its cell count. [[withK]] is the pinned-k core the
  * `dd_semantic` oracle query replays deterministically in SQL (k = 8).
  */
object SemDedup {

  /** Cluster count that keeps cells ~`targetCell` as the corpus grows. */
  def kFor(rows: Long, targetCell: Long): Int = {
    require(targetCell > 0, s"targetCell must be positive, got $targetCell")
    math.min(Int.MaxValue.toLong,
      math.max(1L, (rows + targetCell - 1) / targetCell)).toInt
  }

  /** The scale surface: k derived from the corpus so per-cluster O(cell²)
    * work stays flat as rows grow. `rows` may be passed when the caller
    * already knows it (manifest/table stats); otherwise one count() — the
    * cheapest possible pass — derives it.
    */
  def apply(emb: DataFrame, tau: Double, targetCell: Long = 4096L,
            iterations: Int = 2, rows: Option[Long] = None)
           (implicit spark: SparkSession): DataFrame =
    withK(emb, kFor(rows.getOrElse(emb.count()), targetCell), tau, iterations)

  /** Pinned-k core: (vec_id, cluster, kept). One equi-join on cluster +
    * one aggregation — kept = "no lower-id in-cluster neighbor at ≥ τ".
    */
  def withK(emb: DataFrame, k: Int, tau: Double, iterations: Int = 2)
           (implicit spark: SparkSession): DataFrame = {
    val assigned = KMeans.fit(emb, k, iterations)._1
    val vecs = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val av = assigned.join(vecs, "vec_id")
      .select(col("vec_id"), col("cluster"), col("v"))
    val a = av.select(col("cluster").as("cl_a"),
      col("vec_id").as("vec_a"), col("v").as("va"))
    av.join(a, col("cluster") === col("cl_a") &&
        col("vec_a") < col("vec_id") &&
        cosine(col("va"), col("v")) >= lit(tau), "left")
      .groupBy("vec_id", "cluster")
      .agg((count(col("vec_a")) === 0).as("kept"))
  }
}
