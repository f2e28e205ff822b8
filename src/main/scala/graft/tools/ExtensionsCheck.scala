package graft.tools

import org.apache.spark.sql.SparkSession

/** End-to-end check of the `spark.sql.extensions=graft.GraftExtensions`
  * deployment path: a fresh session built with only the config (no
  * register() calls) must resolve every native function in plain SQL.
  * Run: `sbt -batch "runMain graft.tools.ExtensionsCheck"` → prints one
  * OK line per function.
  */
object ExtensionsCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val checks = Seq(
      "cosine_sim" -> "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d))",
      "l2_sq" -> "SELECT l2_sq(array(1.0d, 2.0d), array(3.0d, 5.0d))",
      "tokenize_ru" -> "SELECT tokenize_ru('книги и книга')",
      "winnow_fingerprint" -> "SELECT winnow_fingerprint('a b c d e f g h')",
      "sorted_intersect_count" ->
        "SELECT sorted_intersect_count(array('a','b'), array('b','c'))")
    checks.foreach { case (name, sql) =>
      val v = spark.sql(sql).collect()(0).get(0)
      println(s"[ext-check] OK $name -> $v")
    }
    spark.stop()
  }
}
