package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Physical-layout decisions from SURVEY §4: events partitioned by
  * entity_type give partition pruning on the reference's hot predicates;
  * sources beyond parquet (csv/json round trips) keep their schemas.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("partitionBy(event_type) prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter(col("event_type") === "purchase")
      .select("event_id", "value")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("event_type"), scan)
    // behavioral check: the filter reads exactly the one partition directory
    val n = q.count()
    val direct = spark.read
      .parquet(s"$dir/event_type=purchase").count()
    assert(n > 0 && n == direct, s"$n vs $direct")
  }

  test("csv and json sinks round-trip with explicit schemas") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "source", "n_chars")  // csv: no free text
    val dir = java.nio.file.Files.createTempDirectory("graft-src").toString
    docs.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    docs.write.mode("overwrite").json(s"$dir/json")
    val backCsv = spark.read.schema(docs.schema)
      .option("header", "true").csv(s"$dir/csv")
    val backJson = spark.read.schema(docs.schema).json(s"$dir/json")
    assert(backCsv.exceptAll(docs).isEmpty && docs.exceptAll(backCsv).isEmpty)
    assert(backJson.exceptAll(docs).isEmpty && docs.exceptAll(backJson).isEmpty)
  }
}
