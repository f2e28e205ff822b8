package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions.{asDouble, cosine}
import graft.sources.TxLogTable

/** Persisted ANN index lifecycle — build once, serve many (round-5 gap #3:
  * every IVF/PQ query used to re-fit k-means in-query with session caches).
  * At 100 TB an index is a first-class ARTIFACT: trained on a pinned
  * corpus snapshot, persisted as tx-log tables, loaded by every query and
  * every session until the corpus moves and it is rebuilt.
  *
  * Layout under `indexRoot` (all tx-log tables — versioned, vacuumable,
  * time-travelable like any other):
  *   - `meta`        (key, value): corpus root, PINNED corpus version,
  *                   corpus schema JSON, k, iterations
  *   - `centroids`   (cluster, cv): the trained coarse quantizer
  *   - `assignments` (vec_id, cluster): corpus routing at build time
  *
  * Staleness contract: the index answers for the corpus snapshot it was
  * built on. [[searchIvf]] with `requireFresh = true` REFUSES when the
  * corpus has advanced past the pinned version (the serving-layer guard:
  * an index silently lagging its corpus returns wrong neighbors); with
  * `requireFresh = false` it serves the pinned snapshot — consistent
  * results regardless of later corpus writes, valid until the pinned
  * version is vacuumed (then it refuses loudly).
  */
object AnnIndex {

  val metaSchema: StructType = StructType(Seq(
    StructField("key", StringType), StructField("value", StringType)))
  val centroidsSchema: StructType = StructType(Seq(
    StructField("cluster", IntegerType),
    StructField("cv", ArrayType(DoubleType))))
  val assignmentsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType), StructField("cluster", IntegerType)))

  /** Train and persist an IVF index over the corpus's CURRENT version.
    * One k-means fit (the only time the corpus is scanned for training),
    * three overwrite commits. Returns the pinned corpus version.
    */
  def build(spark: SparkSession, corpusRoot: String, indexRoot: String,
            corpusSchema: StructType, k: Int, iterations: Int): Int = {
    implicit val sp: SparkSession = spark
    import spark.implicits._
    val corpus = TxLogTable(spark, corpusRoot)
    val v = corpus.latestVersion.getOrElse(
      throw new IllegalStateException(s"empty corpus at $corpusRoot"))
    val emb = corpus.snapshot(corpusSchema, Some(v))
    val (assigned, cents) = KMeans.fit(emb, k, iterations)
    val op = s"ann-index:corpus_v=$v"
    TxLogTable(spark, s"$indexRoot/centroids").commit(
      cents.select(col("cluster").cast(IntegerType), col("cv")),
      overwrite = true, op = op)
    TxLogTable(spark, s"$indexRoot/assignments").commit(
      assigned.select(col("vec_id"), col("cluster").cast(IntegerType)),
      overwrite = true, op = op)
    TxLogTable(spark, s"$indexRoot/meta").commit(
      Seq("corpus_root" -> corpusRoot,
        "corpus_version" -> v.toString,
        "corpus_schema" -> corpusSchema.json,
        "k" -> k.toString,
        "iterations" -> iterations.toString).toDF("key", "value"),
      overwrite = true, op = op)
    v
  }

  private def loadMeta(spark: SparkSession,
                       indexRoot: String): Map[String, String] =
    TxLogTable(spark, s"$indexRoot/meta").snapshot(metaSchema)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  /** IVF search THROUGH the persisted index: centroids and routing come
    * from the index tables (tiny parquet reads, broadcast), the corpus is
    * read at the PINNED version, and no k-means fit runs — by
    * construction, this method never trains. Cell probing reads ~1/k of
    * the corpus at scale (cluster id is the partition key of the
    * assignments join).
    */
  def searchIvf(spark: SparkSession, indexRoot: String, queryVecId: Long,
                topK: Int, requireFresh: Boolean = false): DataFrame = {
    graft.catalyst.CosineSim.register(spark)
    val meta = loadMeta(spark, indexRoot)
    val pinned = meta("corpus_version").toInt
    val corpus = TxLogTable(spark, meta("corpus_root"))
    if (requireFresh)
      require(corpus.latestVersion.contains(pinned),
        s"stale index at $indexRoot: corpus ${meta("corpus_root")} is at " +
          s"v${corpus.latestVersion.getOrElse(-1)} but the index is pinned " +
          s"to v$pinned — rebuild the index")
    require(corpus.versions.contains(pinned),
      s"index at $indexRoot pins corpus v$pinned, which was vacuumed — " +
        "rebuild the index")
    val schema = DataType.fromJson(meta("corpus_schema"))
      .asInstanceOf[StructType]
    val emb = corpus.snapshot(schema, Some(pinned))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val cents = TxLogTable(spark, s"$indexRoot/centroids")
      .snapshot(centroidsSchema)
    val assigned = TxLogTable(spark, s"$indexRoot/assignments")
      .snapshot(assignmentsSchema)
    val q = emb.filter(col("vec_id") === queryVecId)
      .select(col("v").as("qv"))
    val bestCell = cents.crossJoin(broadcast(q))
      .select(col("cluster"), cosine(col("cv"), col("qv")).as("cs"))
      .orderBy(col("cs").desc, col("cluster"))
      .limit(1).select(col("cluster").as("best_cluster"))
    assigned.join(broadcast(bestCell),
        col("cluster") === col("best_cluster"))
      .join(emb, "vec_id")
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("cluster"),
        cosine(col("v"), col("qv")).as("q_cos"))
      .orderBy(col("q_cos").desc, col("vec_id"))
      .limit(topK)
  }
}
