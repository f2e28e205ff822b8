package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.VectorFunctions._

/** Deterministic distributed k-means (Lloyd's iterations) over an embedding
  * column — the trainable coarse quantizer for IVF-style ANN (replacing the
  * label-as-cell stand-in in sim_ivf_topk).
  *
  * Everything is DataFrame ops: assignment is a broadcast of k centroids +
  * an argmax over cosine similarity; the centroid update is a posexplode →
  * groupBy(cluster, dim) mean. Scale: the only shuffle per iteration is the
  * (k × dim)-key aggregation — the n×d assignment work is map-side.
  *
  * Determinism contract (so an SQL oracle can replay it): per-dimension means
  * use fixed-point accumulation — components floor-quantized to 1/2^20 and
  * summed as exact integers, one double division at the end. `floor` has no
  * rounding-mode ambiguity (unlike double→DECIMAL casts, which Spark and
  * DuckDB round differently on floats' long decimal expansions), so centroid
  * values are bit-identical in any engine. Argmax ties break toward the
  * LOWEST cluster id; seeds are the first k vectors by id — no RNG.
  */
object KMeans {

  /** @return (assignments: vec_id, cluster, cos_sim; centroids: cluster, v)
    *
    * Seeding: by default the initial centroids are the vectors with
    * `vec_id < k` (the original contract, replayed verbatim by the SQL
    * oracles). `seedSmallestK = true` seeds from the k SMALLEST vec_ids
    * PRESENT instead (a TakeOrdered of k rows) — required when `emb` is
    * a sampled training frame whose ids are strided and `vec_id < k`
    * would select almost nothing. Both seedings are deterministic.
    */
  def fit(emb: DataFrame, k: Int, iterations: Int,
          seedSmallestK: Boolean = false)
         (implicit spark: SparkSession): (DataFrame, DataFrame) = {
    graft.catalyst.CosineSim.register(spark)
    val vecs = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    var centroids =
      if (seedSmallestK)
        vecs.orderBy(col("vec_id")).limit(k)
          .select((row_number().over(org.apache.spark.sql.expressions
              .Window.orderBy(col("vec_id"))) - 1).cast("int")
            .as("cluster"), col("v").as("cv"))
      else
        vecs.filter(col("vec_id") < k)
          .select(col("vec_id").cast("int").as("cluster"), col("v").as("cv"))

    def assign(cents: DataFrame): DataFrame = assignTo(vecs, cents)

    var assigned = assign(centroids)
    for (_ <- 2 to iterations) {
      centroids = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos")
        .agg((sum(floor(col("x") * 1048576).cast(LongType)).cast(DoubleType) /
          (count(lit(1)) * 1048576L).cast(DoubleType)).as("m"))
        .groupBy("cluster")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("arr"))
        .select(col("cluster"),
          expr("transform(arr, e -> e.m)").as("cv"))
      assigned = assign(centroids)
    }
    (assigned.select("vec_id", "cluster", "cos_sim"), centroids)
  }

  /** Route `vecs` (vec_id, v) to a FIXED centroid set (cluster, cv) —
    * [[fit]]'s per-iteration assignment, exposed for index refresh:
    * incremental vectors take cells from the trained quantizer without
    * a single training pass. Fully map-side: the k centroids collapse
    * into ONE broadcast row holding an array of (cluster, cv) structs,
    * and the argmax is array_max over per-row (cs, -cluster) structs —
    * struct ordering compares cs first, then -cluster, i.e. lowest-id
    * tie-break. The crossJoin + groupBy(vec_id) alternative shuffled
    * n×k rows and carried the 64-dim vector through the aggregation
    * buffer; this shuffles NOTHING for assignment.
    */
  def assignTo(vecs: DataFrame, cents: DataFrame)
              (implicit spark: SparkSession): DataFrame = {
    graft.catalyst.CosineSim.register(spark)
    val centsRow = cents
      .agg(collect_list(struct(col("cluster"), col("cv"))).as("cents"))
    vecs.crossJoin(broadcast(centsRow))
      .select(col("vec_id"), col("v"),
        array_max(transform(col("cents"), c =>
          struct(cosine(col("v"), c.getField("cv")).as("cs"),
            (-c.getField("cluster")).as("negc")))).as("best"))
      .select(col("vec_id"),
        (-col("best.negc")).cast("int").as("cluster"),
        col("best.cs").as("cos_sim"), col("v"))
  }
}
