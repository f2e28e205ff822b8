package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merge-by-rewrite upsert: the reference's signature write pattern.
  *
  * Every dimension write in the reference is a Postgres
  * `INSERT ... ON CONFLICT (key) DO UPDATE SET <subset>` (U1–U7 in SURVEY §2.4,
  * e.g. `/root/reference/iis_etl/logic.py:63-67` for the K/V store,
  * `logic.py:186-194` for the employees partial update-set). There is no
  * row-level update primitive on immutable columnar storage, so the Spark-first
  * equivalent is a keyed full-outer join producing the table's next content,
  * written atomically with `mode("overwrite")`.
  *
  * Semantics preserved exactly:
  *  - conflict (key present on both sides): `updateCols` take the INCOMING
  *    value (even if null — ON CONFLICT DO UPDATE overwrites), every other
  *    column keeps the CURRENT value (the reference deliberately freezes e.g.
  *    employee names after insert, `logic.py:186-194`);
  *  - new key: full incoming row inserted;
  *  - key only in current: row untouched.
  *
  * Scale: the join shuffles both sides on the key — at 100 TB that is one
  * shuffle of the dimension (dimensions are small) or, for large tables, the
  * natural merge cost; when `incoming` is a small delta Catalyst/AQE broadcast
  * it automatically and the current side streams through map-side.
  */
object Upsert {

  def apply(current: DataFrame, incoming: DataFrame, keys: Seq[String],
            updateCols: Seq[String]): DataFrame = {
    val dataCols = current.columns.filterNot(keys.contains).toSeq
    require(incoming.columns.sorted.sameElements(current.columns.sorted),
      s"schema mismatch: ${current.columns.mkString(",")} vs ${incoming.columns.mkString(",")}")
    val inc = dataCols
      .foldLeft(incoming)((d, c) => d.withColumnRenamed(c, s"__inc_$c"))
      .withColumn("__inc", lit(true))
    val cur = current.withColumn("__cur", lit(true))
    val joined = cur.join(inc, keys, "full_outer")
    val out = keys.map(col) ++ dataCols.map { c =>
      val pick =
        if (updateCols.contains(c))
          when(col("__inc"), col(s"__inc_$c")).otherwise(col(c))
        else
          when(col("__cur"), col(c)).otherwise(col(s"__inc_$c"))
      pick.as(c)
    }
    joined.select(out: _*)
  }

  /** U7 `on_conflict_do_nothing` (`/root/reference/iis_etl/logic.py:214,246-249`):
    * keep current row wholesale when the key exists; append otherwise.
    */
  def insertIfAbsent(current: DataFrame, incoming: DataFrame,
                     keys: Seq[String]): DataFrame =
    current.unionByName(
      incoming.join(current.select(keys.map(col): _*).distinct(),
        keys, "left_anti"))

  /** U8 delete-then-insert, full replace per parent key
    * (`/root/reference/iis_etl/logic.py:197-214` bridge rows,
    * `logic.py:387-392` events): anti-join out every current row whose key
    * appears in the incoming slice, then append the fresh slice. At scale this
    * is dynamic-partition overwrite when the table is partitioned by the key.
    */
  def deleteInsert(current: DataFrame, incoming: DataFrame,
                   keys: Seq[String]): DataFrame =
    current
      .join(incoming.select(keys.map(col): _*).distinct(), keys, "left_anti")
      // a using-column join hoists the keys to the front; restore the
      // table's declared column order
      .select(current.columns.toIndexedSeq.map(col): _*)
      .unionByName(incoming)
}
