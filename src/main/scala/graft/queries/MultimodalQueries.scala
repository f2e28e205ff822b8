package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sources.Tables

/** Binary-column plumbing, oracle-checked: the metadata path of the
  * multimodal module (decode itself is stubbed — see
  * [[graft.multimodal.Multimodal.DecodeStub]] — and covered by unit tests;
  * what the oracle can check is the schema/pruning-relevant surface: byte
  * lengths, magic prefixes, kind routing).
  */
object MultimodalQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> ((s, dir) =>
      Multimodal.fromDocuments(t(s, dir, "documents")).select(
        col("media_id"), col("kind"),
        octet_length(col("media_bytes")).as("n_bytes"),
        col("meta.source_doc"),
        lower(hex(expr(
          "cast(substring(cast(media_bytes as string), 1, 4) as binary)")))
          .as("magic"))),

    // Binary-payload exact dedup: media dedup never decodes — the content
    // hash is computed over the raw bytes map-side, the only shuffle is the
    // hash-keyed window, and payloads themselves never move (at 100 TB the
    // shuffle carries 32-byte digests, not terabytes of media).
    "mm_dedup" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("content_hash")
      Multimodal.fromDocuments(t(s, dir, "documents"))
        .select(col("media_id"), col("kind"),
          md5(col("media_bytes")).as("content_hash"))
        .withColumn("canonical_id", min("media_id").over(w))
        .withColumn("is_dup", col("media_id") =!= col("canonical_id"))
    }))

  val oracle: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS kind,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           doc_id AS source_doc,
           lower(hex(encode(substring(text, 1, 4)))) AS magic
         FROM documents""",

    // DuckDB's md5 takes VARCHAR and hashes its UTF-8 bytes — exactly the
    // payload bytes (media_bytes = encode(text)) Spark's binary md5 sees.
    "mm_dedup" ->
      """SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS kind,
           md5(text) AS content_hash,
           MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
           doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
         FROM documents""")
}
