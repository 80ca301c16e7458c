package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column surface (north-star gap-fill): the `documents`
  * text bytes stand in for opaque media blobs; features that are
  * SQL-expressible (byte length, content checksum, header bytes,
  * stub class/frame-count) are oracle-checked here, while the typed
  * mapPartitions decode pipeline lives in
  * [[graft.operators.Multimodal]] (tested in MultimodalSpec).
  */
object MultimodalQueries {

  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "documents")
      .select(
        col("doc_id"),
        octet_length(col("text")).cast("long").as("byte_len"),
        md5(col("text")).as("checksum"),
        lower(hex(substring(col("text"), 1, 4).cast("binary"))).as("header_hex"),
        (ascii(substring(md5(col("text")), 1, 1)) % 4).cast("long")
          .as("stub_class"),
        expr("1 + octet_length(text) div 4096").cast("long").as("n_frames"))
      .orderBy("doc_id")

  def multimodalFeaturesOracle: String =
    """SELECT doc_id,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) byte_len,
      |  md5(text) checksum,
      |  lower(hex(CAST(substring(text, 1, 4) AS BLOB))) header_hex,
      |  CAST(ascii(substring(md5(text), 1, 1)) % 4 AS BIGINT) stub_class,
      |  CAST(1 + octet_length(CAST(text AS BLOB)) // 4096 AS BIGINT) n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "multimodal_features",
      multimodalFeatures,
      Some(multimodalFeaturesOracle)))
}
