package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Contiguous global indices `0..N-1` in a declared total order — the
  * operator behind a DETERMINISTIC corpus shuffle: a training run wants
  * every document assigned a stable position in a seeded pseudo-random
  * order (sample `i` of epoch `e` must be the same document on every
  * engine, every rerun, every resume), and the naive
  * `row_number() OVER (ORDER BY key)` computes that through ONE
  * partition holding the whole corpus — a non-starter at 100 TB.
  *
  * Spark-first shape: `repartitionByRange` on the sort columns (a
  * distributed total sort — range exchange + within-partition sort, the
  * same machinery as a global ORDER BY) and then the RDD `zipWithIndex`
  * two-pass (count rows per partition, broadcast the prefix offsets,
  * stamp each partition's rows locally). Every stage is distributed;
  * the only driver-side data is one Long per partition. The RDD drop
  * is deliberate and contained: per-partition sequential stamping is
  * the textbook case DataFrame windows cannot express without killing
  * parallelism.
  *
  * Determinism: the assignment is a pure function of the DATA whenever
  * `sortCols` is a TOTAL order of the input (pass a unique tiebreaker
  * as the last column — a hash key alone can collide). Range bounds are
  * sampled, but bounds only move rows between partitions, never change
  * the global order, so the stamped indices are bound-independent.
  */
object GlobalIndex {
  def assign(df: DataFrame, sortCols: Seq[String],
             indexCol: String = "idx",
             numPartitions: Int = 0): DataFrame = {
    require(sortCols.nonEmpty, "GlobalIndex.assign needs sort columns")
    require(!df.columns.contains(indexCol),
      s"index column $indexCol already exists")
    val spark = df.sparkSession
    // shuffle.partitions may be non-numeric on AQE-managed platforms
    // ("auto"): fall back to the input's own partitioning rather than
    // failing the stamp
    val n =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toIntOption
        .getOrElse(df.rdd.getNumPartitions)
    val cols = sortCols.map(col)
    val ranged = df.repartitionByRange(n, cols: _*)
      .sortWithinPartitions(cols: _*)
    val out = df.schema.add(indexCol, LongType, nullable = false)
    spark.createDataFrame(
      ranged.rdd.zipWithIndex().map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ i)
      }, out)
  }
}
