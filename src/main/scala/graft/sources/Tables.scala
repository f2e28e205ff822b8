package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table source for the engine's tables.
  *
  * The reference loads everything from an HTTP API into Postgres row-stores
  * (`/root/reference/iis_etl/client.py:38-63`, `database.py:6-13`); our
  * engine's native storage is columnar parquet, one file-set per table, read
  * with the schema that was written (never inferred — the reference's schema
  * is fixed, `models.py:10-125`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `spark.read.parquet` keeps column pruning + predicate pushdown available
    * to Catalyst — every query below projects/filters as late as it likes and
    * the scan still reads only what it needs (verified via `PushedFilters` /
    * `ReadSchema` in `.explain("formatted")`).
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The driver-generated `events` table stores TIMESTAMP(NANOS) which Spark
    // 4.x refuses by default ([PARQUET_TYPE_ILLEGAL]); the public escape hatch
    // reads it as epoch-nanos LongType — integer-exact, deterministic, and
    // cheap to derive calendar fields from (DuckDB side: `epoch_ns(ts)`).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
