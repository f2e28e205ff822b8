package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Min-label propagation to a FIXED POINT over a bipartite node–bucket graph
  * — the convergent form of the LSH duplicate-cluster assignment
  * (`dd_minhash_cluster_cc` keeps a 3-round variant so a plain SQL oracle can
  * replay it; an unconverged propagation silently under-merges clusters, so
  * the production path must iterate until labels stop changing).
  *
  * Each round is two shuffles keyed on bucket / node: bucket-min of its
  * members' labels, then node-min over its buckets. Labels decrease
  * monotonically toward each component's minimum node id, so rounds needed =
  * the bucket-graph diameter. Per-round `localCheckpoint` truncates the
  * lineage (an iterative plan would otherwise grow unboundedly and
  * re-execute prior rounds), and the convergence probe is a cheap
  * existence check, not a full count.
  *
  * 100 TB: identical shape to the large-graph connected-components algorithms
  * used for web-scale dedup — state is O(nodes), each round O(edges) shuffle,
  * no driver-side data beyond the per-round changed flag.
  */
object LabelPropagation {

  /** Connected components: returns (idCol, cluster_id) with cluster_id = the
    * minimum idCol value in the component.
    *
    * @param edges      one row per (node, bucket) membership
    * @param idCol      numeric node id column
    * @param bucketCols bucket key columns
    * @param maxRounds  safety bound; propagation stops early on convergence
    */
  def connectedComponents(edges: DataFrame, idCol: String,
                          bucketCols: Seq[String],
                          maxRounds: Int = 50): DataFrame = {
    val (labels, converged, rounds) =
      connectedComponentsWithStatus(edges, idCol, bucketCols, maxRounds)
    if (!converged)
      // Truncated output silently UNDER-MERGES clusters (the failure mode
      // the fixed 3-round variant documents) — callers who can tolerate it
      // should use connectedComponentsWithStatus and decide themselves.
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"label propagation hit maxRounds=$maxRounds without converging " +
          s"($rounds rounds run); labels may under-merge components")
    labels
  }

  /** As [[connectedComponents]], but also reports whether the propagation
    * reached its fixed point and how many rounds ran.
    */
  def connectedComponentsWithStatus(edges: DataFrame, idCol: String,
                                    bucketCols: Seq[String],
                                    maxRounds: Int = 50)
      : (DataFrame, Boolean, Int) = {
    // Cached: every round re-reads the edge set. NOT unpersisted on exit —
    // Spark's CacheManager dedups cache entries by logical plan, so evicting
    // here would also evict a caller-shared cache of the same plan; the
    // caller owns the lifecycle.
    val e = edges.select((idCol +: bucketCols).map(col): _*).cache()
    var labels = e.select(col(idCol)).distinct()
      .withColumn("lab", col(idCol)).localCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val bucketMin = e.join(labels, idCol)
        .groupBy(bucketCols.map(col): _*)
        .agg(min("lab").as("bucket_lab"))
      val next = e.join(bucketMin, bucketCols)
        .groupBy(col(idCol))
        .agg(min("bucket_lab").as("lab")).localCheckpoint()
      converged = next
        .join(labels.withColumnRenamed("lab", "prev"), idCol)
        .filter(col("lab") =!= col("prev"))
        .isEmpty
      labels = next
      round += 1
    }
    (labels.select(col(idCol), col("lab").as("cluster_id")), converged, round)
  }
}
