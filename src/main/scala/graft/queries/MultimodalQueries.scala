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
          .as("magic"))))

  val oracle: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS kind,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           doc_id AS source_doc,
           lower(hex(encode(substring(text, 1, 4)))) AS magic
         FROM documents""")
}
