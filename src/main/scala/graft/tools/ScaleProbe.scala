package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe: replicate the sf0.1 documents corpus 10× (doc_id offset per
  * copy keeps ids unique; duplication structure scales with it) and time the
  * round-2 heavy operators. Run:
  *   sbt -batch "runMain graft.tools.ScaleProbe"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def rep(k: Int): DataFrame = (0 until k).map(i =>
      base.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_.unionByName(_))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }
    for (k <- Seq(1, 10)) {
      val docs = rep(k).cache(); docs.count()
      val dir = s"memory-$k" // unused by the query bodies below
      // conv clusters over k× corpus
      time(s"cluster_conv x$k") {
        val bands = graft.queries.TextQueries.bandsOf(docs)
        graft.operators.LabelPropagation
          .connectedComponents(bands, "doc_id", Seq("band", "band_key"))
          .count()
      }
      time(s"jaccard_lsh x$k") {
        graft.queries.TextQueries.jaccardLshOf(docs).count()
      }
      docs.unpersist(true)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
