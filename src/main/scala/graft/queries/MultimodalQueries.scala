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

  /** Frame sampling as a declarative plan (every 2nd frame): the same
    * math as the typed [[graft.operators.Multimodal.sampleFrames]]
    * path (MultimodalSpec asserts row-for-row parity), expressed with
    * sequence+explode so the oracle can state it.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "documents")
      .select(
        col("doc_id"),
        md5(col("text")).as("cs"),
        expr("1 + octet_length(text) div 4096").as("nf"))
      .select(
        col("doc_id"), col("cs"),
        explode(sequence(lit(0), col("nf") - 1, lit(2))).as("i"))
      .select(
        col("doc_id"),
        col("i").cast("long").as("frame_idx"),
        (col("i") * 4096L).cast("long").as("byte_offset"),
        md5(concat(col("cs"), lit(":"), col("i").cast("string")))
          .as("frame_hash"))
      .orderBy("doc_id", "frame_idx")

  def frameSampleOracle: String =
    """SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
      |  CAST(i * 4096 AS BIGINT) AS byte_offset,
      |  md5(md5(text) || ':' || CAST(i AS VARCHAR)) AS frame_hash
      |FROM documents,
      |  unnest(range(0, 1 + octet_length(CAST(text AS BLOB)) // 4096, 2)) t(i)
      |ORDER BY doc_id, frame_idx""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "multimodal_features",
      multimodalFeatures,
      Some(multimodalFeaturesOracle)),
    QueryDef("frame_sample", frameSample, Some(frameSampleOracle)))
}
