package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B: label-propagation checkpoint cadence (every round vs every 2) on the
  * sf0.1 corpus, 4 reps each in one JVM — bench-level single runs on this
  * host carry ±30% co-tenant noise, so cadence decisions come from here.
  */
object LpAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val bands = graft.queries.TextQueries.bandsOf(docs)
    bands.count() // shared warm cache, both variants measured on equal state
    for (rep <- 1 to 4; every <- Seq(1, 2)) {
      val t0 = System.nanoTime()
      val (labels, converged, rounds) = graft.operators.LabelPropagation
        .connectedComponentsWithStatus(bands, "doc_id",
          Seq("band", "band_key"), checkpointEvery = every)
      val n = labels.count()
      println(f"[ab] rep$rep every=$every ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        f" (rows=$n converged=$converged rounds=$rounds)")
    }
    spark.stop()
  }
}
