package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** A/B: the PQ encode's per-(vector, code, subspace) squared L2 via the
  * HOF-composed fold (`aggregate(zip_with(...))`, CodegenFallback) vs the
  * native fused-loop `catalyst.L2Sq` — the measurement behind promoting
  * squared L2 to a native expression (same rule as the cosine promotion:
  * per-element work ≪ lambda dispatch). 3 reps each on sf0.1.
  */
object PqAB {
  private val M = 4
  private val SubDim = 16
  private val Codes = 16

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.catalyst.L2Sq.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))

    def subs(df: DataFrame): DataFrame =
      df.select(col("vec_id"), explode(array((0 until M).map(si =>
          struct(lit(si).as("s"),
            slice(col("v"), si * SubDim + 1, SubDim).as("sv"))): _*))
        .as("sub"))
        .select(col("vec_id"), col("sub.s").as("s"), col("sub.sv").as("sv"))

    def encode(l2: (Column, Column) => Column): Long = {
      val sv = subs(emb)
      val cb = subs(emb.filter(col("vec_id") < Codes))
        .select(col("vec_id").cast(IntegerType).as("code"),
          col("s").as("cs"), col("sv").as("cv"))
      val w = Window.partitionBy("vec_id", "s")
        .orderBy(col("dist"), col("code"))
      sv.join(broadcast(cb), col("s") === col("cs"))
        .select(col("vec_id"), col("s"), col("code"),
          l2(col("sv"), col("cv")).as("dist"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .count()
    }

    val composed = (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    val native = (a: Column, b: Column) => graft.catalyst.L2Sq.l2sq(a, b)

    encode(native) // session warm-up, charged to neither side
    Seq("composed" -> composed, "native" -> native).foreach {
      case (name, fn) =>
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          encode(fn)
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$name%10s min=${times.min}%.3f s  (${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
