package graft.operators

import graft.TestSpark
import graft.operators.Multimodal.MediaRecord
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The typed binary decode pipeline: schema, per-partition batching,
  * determinism, and agreement with the SQL-expressible features.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def records = {
    import spark.implicits._
    TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(
        col("doc_id"),
        lit("text/plain").as("media_type"),
        col("text").cast("binary").as("content"))
      .as[MediaRecord]
  }

  test("decode pipeline yields typed features with stable checksums") {
    import spark.implicits._
    val feats = Multimodal.extractFeatures(records)
    val got = feats.collect().sortBy(_.doc_id)
    assert(got.nonEmpty)
    assert(got.forall(_.embedding.length == 8))
    assert(got.forall(_.n_frames >= 1))
    // checksum agrees with the SQL md5 over the same bytes
    val sqlMd5 = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), md5(col("text")).as("m"))
      .as[(Long, String)].collect().toMap
    got.take(20).foreach(f => assert(f.checksum == sqlMd5(f.doc_id)))
  }

  test("features are partitioning-invariant") {
    val a = Multimodal.extractFeatures(records)
      .collect().sortBy(_.doc_id).map(f => (f.doc_id, f.checksum, f.embedding.toSeq))
    val b = Multimodal.extractFeatures(records.repartition(7))
      .collect().sortBy(_.doc_id).map(f => (f.doc_id, f.checksum, f.embedding.toSeq))
    assert(a.toSeq == b.toSeq)
  }

  test("resize emits fixed-dimension deterministic binaries") {
    val out = Multimodal.resize(records, 16, 9).collect().sortBy(_.doc_id)
    assert(out.nonEmpty)
    assert(out.forall(r => r.width == 16 && r.height == 9))
    assert(out.forall(r => r.byte_len == 144 && r.content.length == 144))
    val again = Multimodal.resize(records.repartition(5), 16, 9)
      .collect().sortBy(_.doc_id)
    assert(out.map(_.content.toSeq).toSeq == again.map(_.content.toSeq).toSeq)
  }

  test("typed frame sampling equals the declarative frame_sample query") {
    val typed = Multimodal.sampleFrames(records, every = 2)
      .collect()
      .map(f => (f.doc_id, f.frame_idx.toLong, f.byte_offset, f.frame_hash))
      .sortBy(x => (x._1, x._2))
    val query = graft.queries.MultimodalQueries
      .frameSample(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(typed.nonEmpty)
    assert(typed.toSeq == query.toSeq)
  }
}
