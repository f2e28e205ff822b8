package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** A/B: word-3-gram construction forms for tx_decontaminate — the slice
  * form allocates a 3-element array per gram (`transform(sequence, i ->
  * concat_ws(slice(toks, i+1, 3)))`), the zip form builds grams with two
  * `zip_with` string concats and no per-gram array. Run at sf0.1 to decide
  * which the query ships with; also splits the query's phases (gram
  * explode vs join vs anti-join) to locate the cost.
  */
object DecontAB {
  private val N = 3

  def gramsSlice(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) >= N,
      array_distinct(transform(sequence(lit(0), size(toks) - N),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(N))))))
      .otherwise(array().cast("array<string>"))
  }

  def gramsZip(text: Column): Column = {
    val toks = tokens(text)
    val b = slice(toks, lit(2), greatest(lit(0), size(toks) - 1))
    val c = slice(toks, lit(3), greatest(lit(0), size(toks) - 2))
    val g = zip_with(zip_with(toks, b, (x, y) => concat(x, lit(" "), y)),
      c, (xy, z) => concat(xy, lit(" "), z))
    when(size(toks) >= N,
      array_distinct(slice(g, lit(1), size(toks) - lit(N) + 1)))
      .otherwise(array().cast("array<string>"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables(spark, sfDir, "documents")

    def time(label: String)(f: => Long): Unit = (1 to 3).foreach { p =>
      val t0 = System.nanoTime()
      val n = f
      println(f"$label pass $p: ${(System.nanoTime() - t0) / 1e9}%.3f s (n=$n)")
    }

    // phase 1 cost: the gram explode alone
    time("explode slice") {
      docs.select(explode(gramsSlice(col("text")))).count() }
    time("explode zip") {
      docs.select(explode(gramsZip(col("text")))).count() }

    // full query with each form
    def full(grams: Column => Column): Long = {
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val train = docs.filter(col("doc_id") % 97 =!= 0)
      val benchGrams = bench
        .select(explode(grams(col("text"))).as("gram")).distinct()
      val contaminated = train
        .select(col("doc_id"), explode(grams(col("text"))).as("gram"))
        .join(broadcast(benchGrams), "gram")
        .select("doc_id").distinct()
      train.join(contaminated, Seq("doc_id"), "left_anti").count()
    }
    time("full slice")(full(gramsSlice))
    time("full zip")(full(gramsZip))
    spark.stop()
  }
}
