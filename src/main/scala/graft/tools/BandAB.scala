package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B: grouped (explode+groupBy) vs stateless (array_min/transform)
  * banding, 3 reps each, timing banding materialization + the LSH pair
  * join that streams from it.
  */
object BandAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TextFunctions._
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def grouped(): DataFrame = {
      val toks = docs.select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("tok"))
      val sig = toks.groupBy("doc_id").agg(
        min(md5(concat(lit("0:"), col("tok")))).as("h0"),
        (1 to 15).map(i =>
          min(md5(concat(lit(s"$i:"), col("tok")))).as(s"h$i")): _*)
      val bandCols = (0 to 3).map { b =>
        struct(lit(b).cast("long").as("band"),
          md5(concat_ws(",", (0 to 3).map(j => col(s"h${b * 4 + j}")): _*))
            .as("band_key"))
      }
      sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"),
          col("bk.band_key").as("band_key"))
    }
    def stateless(): DataFrame = graft.queries.TextQueries.bandsOf(docs)

    def pairs(bands: DataFrame): Long = {
      val a = bands.select(col("band"), col("band_key"),
        col("doc_id").as("doc_a"))
      val b = bands.select(col("band").as("band_b"),
        col("band_key").as("band_key_b"), col("doc_id").as("doc_b"))
      a.join(b, col("band") === col("band_b") &&
          col("band_key") === col("band_key_b") &&
          col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct().count()
    }
    for (rep <- 1 to 3; (name, mk) <- Seq(
        "grouped" -> (() => grouped()), "stateless" -> (() => stateless()))) {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val bands = mk().cache()
      bands.count()
      val t1 = System.nanoTime()
      val n = pairs(bands)
      val t2 = System.nanoTime()
      println(f"[ab] rep$rep $name%-10s bands=${(t1 - t0) / 1e9}%.2f s pairs=${(t2 - t1) / 1e9}%.2f s ($n)")
    }
    spark.stop()
  }
}
