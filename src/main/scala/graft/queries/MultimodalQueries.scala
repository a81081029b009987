package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Multimodal

/** Driver-gated check of the multimodal plumbing: the mapPartitions
  * decode path runs for real; the stub decoder's byte math is replicated
  * by the oracle over the same utf-8 bytes (corpus text is ASCII).
  */
object MultimodalQueries extends QueryPack {

  /** m01 — binary decode + featurize + frame-sample through the typed
    * Dataset mapPartitions pipeline. */
  def m01DecodeFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeFeatures(Multimodal.mediaFromDocuments(s, dir))
      .toDF()
      .select("id", "format", "n_bytes", "first_byte", "checksum16", "frames")
      .orderBy("id")

  val queries: Map[String, QueryFn] = Map(
    "m01_decode_features" -> (m01DecodeFeatures _))

  val oracles: Map[String, String] = Map(
    "m01_decode_features" ->
      """SELECT doc_id AS id, 'txt' AS format,
        | CAST(length(text) AS INT) AS n_bytes,
        | CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
        | CAST(list_sum(list_transform(range(1, least(16, length(text)) + 1),
        |   i -> ascii(substr(text, i, 1)))) AS BIGINT) AS checksum16,
        | [CAST(ascii(substr(text, least(length(text) - 1, k * length(text) // 4) + 1, 1)) AS INT)
        |  for k in range(0, 4)] AS frames
        |FROM documents ORDER BY id""".stripMargin)
}
