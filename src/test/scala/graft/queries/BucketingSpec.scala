package graft.queries

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bucketing = the co-located join story for 100 TB: both fact tables
  * pre-partitioned into the same bucket layout on the join key join with
  * ZERO shuffle — the property this spec pins. On a real cluster this is the
  * difference between re-shuffling 100 TB per join and reading it in place.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed tables join without a shuffle exchange") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val n = joined.count()
      assert(n > 0)
      val exec = joined.queryExecution.executedPlan
      val shuffles = exec.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
          case e: ShuffleExchangeExec => e
        }
        case e: ShuffleExchangeExec => Seq(e)
      }.flatten
      // the JOIN itself must be shuffle-free; the only allowed exchange is
      // the final 5-group aggregation
      assert(shuffles.size <= 1, exec.toString)
      assert(exec.toString.contains("SortMergeJoin") ||
        exec.toString.contains("ShuffledHashJoin"), exec.toString)
      // and the same join WITHOUT bucketing shuffles both sides
      val unbucketed = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      unbucketed.count()
      val unbShuffles = unbucketed.queryExecution.executedPlan.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
          case e: ShuffleExchangeExec => e
        }
        case e: ShuffleExchangeExec => Seq(e)
      }.flatten
      assert(unbShuffles.size > shuffles.size, "control join should shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
