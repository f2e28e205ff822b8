package org.apache.spark.sql.graft

import org.apache.spark.sql.connector.catalog.{CatalogV2Util, TableChange}
import org.apache.spark.sql.types.{Metadata, StructType}

/** `CatalogV2Util.applySchemaChanges` is the analyzer's OWN conversion of
  * a V2 `AddColumn` change (including its `ColumnDefaultValue`) into the
  * `StructField` metadata keys (`CURRENT_DEFAULT` / `EXISTS_DEFAULT`)
  * that `ResolveDefaultColumns` and the parquet readers consume. It is
  * `private[sql]` at the Scala level — hence this one-liner in the
  * org.apache.spark.sql namespace — and reusing it guarantees the txlog
  * catalog records EXACTLY the metadata shape every Spark component
  * expects, instead of hand-assembling the keys and drifting when Spark
  * evolves them.
  */
object ColumnDefaultsShim {

  /** The field metadata Spark derives for one AddColumn change (its
    * default-value keys included); empty when the change carries none.
    * Provider declared as "parquet": the conversion gate
    * (`ResolveDefaultColumns.validateTableProviderForDefaultValue`)
    * allowlists file formats whose READERS honor EXISTS_DEFAULT, and a
    * txlog table's data files are physically parquet read through
    * Spark's own parquet source — exactly the reader the allowlist
    * vouches for. */
  def addColumnMetadata(ac: TableChange.AddColumn): Metadata =
    CatalogV2Util
      .applySchemaChanges(new StructType(), Seq(ac), Some("parquet"),
        "ALTER TABLE")
      .fields.headOption.map(_.metadata).getOrElse(Metadata.empty)
}
