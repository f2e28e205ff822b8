package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with
  * `right.ts <= left.ts` in the same key group (the temporal lookup Spark
  * has no built-in operator for; composed from built-ins per the preference
  * order in the build brief: compose > custom plan).
  *
  * Implementation is the scalable union+window form, NOT an inequality
  * join: both sides are tagged and unioned, shuffled ONCE on the key, and a
  * `last_value(..., ignoreNulls)` window ordered by (ts, rightFirst) carries
  * the most recent right payload forward onto each left row. Cost is one
  * shuffle + one sort — an inequality join would be O(|L|·|R|) per key and
  * is exactly what this shape avoids at 100 TB. Right rows at ts equal to
  * the left row's ts match (<= semantics), as in DuckDB/kdb ASOF.
  */
object AsOfJoin {

  /** @param left     probe side
    * @param right    reference side (its `rightVals` columns are appended)
    * @param key      equi-key both sides share
    * @param ts       ordering column name present on both sides
    * @param rightVals right-side payload columns to carry onto left rows
    */
  def apply(left: DataFrame, right: DataFrame, key: String, ts: String,
            rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType)))

    // the payload travels as ONE struct so all carried columns come from the
    // SAME right row even when individual right values are null
    val taggedRight = right.select(
      (Seq(col(key), col(ts), lit(1).as("__is_right"),
        struct(rightVals.map(col): _*).as("__asof_payload")) ++
        leftCols.filterNot(Seq(key, ts).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (Seq(col(key), col(ts), lit(0).as("__is_right"),
        lit(null).cast(payloadType).as("__asof_payload")) ++
        leftCols.filterNot(Seq(key, ts).contains).map(col)): _*)

    // right rows sort BEFORE left rows at equal ts → <= match semantics
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight.unionByName(taggedLeft)
      .withColumn("__asof_payload",
        last(col("__asof_payload"), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
      .select((leftCols.map(col) ++
        rightVals.map(c => col(s"__asof_payload.$c").as(c))): _*)
  }
}
