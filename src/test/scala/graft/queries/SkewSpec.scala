package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** AQE skew handling (the runtime half of the skew story; the compile-time
  * half is the salted aggregate in a2_salted_collect): a join with one hot
  * key gets its oversized partition split at runtime by OptimizeSkewedJoin.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // thresholds scaled down so local data triggers the optimizer
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // the downstream global aggregate makes AQE conservative (splitting
      // would add a shuffle before it) — force, as a production job with a
      // truly hot key would
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")

      // one hot key (0) carrying ~90% of rows + a uniform tail
      val skewed = spark.range(200000)
        .select(when($"id" % 10 =!= 0, lit(0L)).otherwise($"id").as("k"),
          concat(lit("payload-payload-payload-"), $"id").as("v"))
      val dim = spark.range(200000).select($"id".as("k"),
        ($"id" * 2).as("w"))
      val joined = skewed.join(dim, "k")
        .agg(count(lit(1)).as("n"), sum("w").as("s"))
      // head() would spawn a separate limit execution — collect the SAME
      // QueryExecution whose adaptive plan we then unwrap
      val rows = joined.collect()
      assert(rows.head.getLong(0) == 200000L)
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case other => other.toString
      }
      // AQE marks the rewritten join: SortMergeJoin ... skew=true
      assert(finalPlan.contains("skew=true"), finalPlan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      spark.conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")
    }
  }
}
