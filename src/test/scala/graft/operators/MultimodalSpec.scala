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

  // --- real ImageIO codec ---

  private def pngRecords = {
    import spark.implicits._
    spark.range(0, 64).map { i =>
      val id = i
      MediaRecord(
        id, "image/png",
        Multimodal.ImageCodec.encodeGrayPng(
          16 + (id % 16).toInt, 16 + (id % 8).toInt,
          (x, y) => ((7L * x + 13L * y + 31L * id) % 256L).toInt))
    }
  }

  test("PNG encode->decode round-trips pixels exactly (real ImageIO)") {
    val png = Multimodal.ImageCodec.encodeGrayPng(
      20, 17, (x, y) => (x * 7 + y * 13 + 5) % 256)
    val img = Multimodal.ImageCodec.decode(png)
    assert(img.getWidth == 20 && img.getHeight == 17)
    for (y <- 0 until 17; x <- 0 until 20)
      assert(Multimodal.ImageCodec.luminance(img, x, y)
        == (x * 7 + y * 13 + 5) % 256)
  }

  test("decodeImages features match the generating pixel function") {
    val got = Multimodal.decodeImages(pngRecords).collect().sortBy(_.doc_id)
    assert(got.length == 64)
    got.foreach { f =>
      val (w, h) = (16 + (f.doc_id % 16).toInt, 16 + (f.doc_id % 8).toInt)
      assert(f.width == w && f.height == h)
      assert(f.hist.sum == w.toLong * h, "histogram must cover every pixel")
      val wantHist = new Array[Long](16)
      for (y <- 0 until h; x <- 0 until w)
        wantHist(((7L * x + 13L * y + 31L * f.doc_id) % 256L).toInt >> 4) += 1
      assert(f.hist.toSeq == wantHist.toSeq)
      assert(f.c00 == (31L * f.doc_id) % 256)
      assert(f.cwh == (7L * (w - 1) + 13L * (h - 1) + 31L * f.doc_id) % 256)
    }
  }

  test("resizeImages is an exact nearest-neighbor downsample") {
    val out = Multimodal.resizeImages(pngRecords, 4, 4)
      .collect().sortBy(_.doc_id)
    assert(out.length == 64)
    out.foreach { r =>
      val (w, h) = (16 + (r.doc_id % 16).toInt, 16 + (r.doc_id % 8).toInt)
      val img = Multimodal.ImageCodec.decode(r.content)
      assert(img.getWidth == 4 && img.getHeight == 4)
      for (j <- 0 until 4; i <- 0 until 4) {
        val (sx, sy) = (i * w / 4, j * h / 4)
        assert(Multimodal.ImageCodec.luminance(img, i, j)
          == ((7L * sx + 13L * sy + 31L * r.doc_id) % 256L).toInt)
      }
    }
    // partitioning invariance, per the stub-path discipline
    val again = Multimodal.resizeImages(pngRecords.repartition(5), 4, 4)
      .collect().sortBy(_.doc_id)
    assert(out.map(_.content.toSeq).toSeq == again.map(_.content.toSeq).toSeq)
  }

  test("WAV encode->decode round-trips samples exactly (real javax.sound)") {
    val want = Array.tabulate(300)(i => ((i * 91) % 40000) - 20000)
    val wav = Multimodal.AudioCodec.encodePcm16Wav(300, want(_))
    val got = Multimodal.AudioCodec.decodePcm16(wav)
    assert(got.length == 300)
    assert(got.toSeq == want.toSeq)
    // boundary values survive (no off-by-one in the clamp or byte order)
    val edge = Multimodal.AudioCodec.decodePcm16(
      Multimodal.AudioCodec.encodePcm16Wav(
        4, Array(Short.MinValue.toInt, -1, 0, Short.MaxValue.toInt)(_)))
    assert(edge.toSeq == Seq(Short.MinValue.toInt, -1, 0, Short.MaxValue.toInt))
  }

  test("decodeAudio features match the generating sample function") {
    import spark.implicits._
    val wavs = spark.range(0, 64).map { id =>
      val n = 64 + (id % 64).toInt
      MediaRecord(
        id, "audio/wav",
        Multimodal.AudioCodec.encodePcm16Wav(
          n, i => (((37L * i + 11L * id) % 2001L) - 1000L).toInt))
    }
    val got = Multimodal.decodeAudio(wavs).collect().sortBy(_.doc_id)
    assert(got.length == 64)
    got.foreach { f =>
      val id = f.doc_id
      val n = 64 + (id % 64).toInt
      val s = Array.tabulate(n)(i => (((37L * i + 11L * id) % 2001L) - 1000L).toInt)
      assert(f.n_samples == n)
      assert(f.peak == s.map(v => math.abs(v.toLong)).max)
      assert(f.sum_abs == s.map(v => math.abs(v.toLong)).sum)
      assert(f.energy == s.map(v => v.toLong * v).sum)
      val zc = (1 until n).count(i => (s(i - 1) < 0) != (s(i) < 0))
      assert(f.zero_crossings == zc)
    }
    // partitioning invariance, per the decode-path discipline
    val again = Multimodal.decodeAudio(wavs.repartition(7))
      .collect().sortBy(_.doc_id)
    assert(got.map(f => (f.doc_id, f.energy, f.zero_crossings)).toSeq ==
      again.map(f => (f.doc_id, f.energy, f.zero_crossings)).toSeq)
  }

  test("Y4M encode->decode round-trips planes exactly (real demux)") {
    val y4m = Multimodal.VideoCodec.encodeY4m(
      6, 4, 3,
      (f, x, y) => f * 50 + x * 7 + y * 13,
      (f, x, y) => f * 3 + x + y * 2,
      (f, x, y) => 255 - f - x - y)
    val clip = Multimodal.VideoCodec.decodeY4m(y4m)
    assert(clip.width == 6 && clip.height == 4 && clip.frames.length == 3)
    for (f <- 0 until 3) {
      val (yp, up, vp) = clip.frames(f)
      assert(yp.length == 24 && up.length == 6 && vp.length == 6)
      for (y <- 0 until 4; x <- 0 until 6)
        assert((yp(y * 6 + x) & 0xff) == (f * 50 + x * 7 + y * 13) % 256)
      for (y <- 0 until 2; x <- 0 until 3) {
        assert((up(y * 3 + x) & 0xff) == (f * 3 + x + y * 2) % 256)
        assert((vp(y * 3 + x) & 0xff) == (255 - f - x - y) % 256)
      }
    }
    // header variants a foreign muxer emits: FRAME params, X-comments
    val withParams =
      "YUV4MPEG2 W2 H2 Ip F30:1 A1:1 C420 XYSCSS=420\nFRAME Ixyz\n"
        .getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4, 5, 6)
    val c = Multimodal.VideoCodec.decodeY4m(withParams)
    assert(c.width == 2 && c.frames.length == 1)
    assert(c.frames(0)._1.toSeq == Seq[Byte](1, 2, 3, 4))
    assert(c.frames(0)._2.toSeq == Seq[Byte](5))
    assert(c.frames(0)._3.toSeq == Seq[Byte](6))
    // malformed streams fail loudly, never partially parse
    intercept[IllegalArgumentException] {
      Multimodal.VideoCodec.decodeY4m("MPEG W2 H2\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.VideoCodec.decodeY4m(
        java.util.Arrays.copyOf(y4m, y4m.length - 1)) // truncated plane
    }
    intercept[IllegalArgumentException] {
      Multimodal.VideoCodec.encodeY4m(5, 4, 1, (_, _, _) => 0,
        (_, _, _) => 0, (_, _, _) => 0) // odd width under C420
    }
  }

  test("decodeVideos features match the generating plane functions") {
    import spark.implicits._
    val clips = spark.range(0, 48).map { id =>
      val w = 8 + (id % 4).toInt * 2
      val h = 6 + (id % 3).toInt * 2
      val nf = 2 + (id % 4).toInt
      MediaRecord(
        id, "video/x-yuv4mpeg2",
        Multimodal.VideoCodec.encodeY4m(
          w, h, nf,
          (f, x, y) => ((11L * f + 7L * x + 13L * y + 31L * id) % 256L).toInt,
          (f, x, y) => ((5L * f + 3L * x + y + 17L * id) % 256L).toInt,
          (f, x, y) => ((3L * f + x + 2L * y + 23L * id) % 256L).toInt))
    }
    val got = Multimodal.decodeVideos(clips).collect().sortBy(_.doc_id)
    assert(got.length == 48)
    got.foreach { v =>
      val id = v.doc_id
      val w = 8 + (id % 4).toInt * 2
      val h = 6 + (id % 3).toInt * 2
      val nf = 2 + (id % 4).toInt
      def yv(f: Int, x: Int, y: Int) = (11L * f + 7L * x + 13L * y + 31L * id) % 256L
      assert(v.width == w && v.height == h && v.n_frames == nf)
      val frameSums = (0 until nf).map(f =>
        (for (y <- 0 until h; x <- 0 until w) yield yv(f, x, y)).sum)
      assert(v.y_sum == frameSums.sum)
      assert(v.max_frame_y == frameSums.max)
      assert(v.u_sum == (for {
        f <- 0 until nf; y <- 0 until h / 2; x <- 0 until w / 2
      } yield (5L * f + 3L * x + y + 17L * id) % 256L).sum)
      assert(v.v_sum == (for {
        f <- 0 until nf; y <- 0 until h / 2; x <- 0 until w / 2
      } yield (3L * f + x + 2L * y + 23L * id) % 256L).sum)
      assert(v.motion == (for {
        f <- 1 until nf; y <- 0 until h; x <- 0 until w
      } yield math.abs(yv(f, x, y) - yv(f - 1, x, y))).sum)
    }
  }

  test("JPEG decodes through the same pipeline (lossy: shape checks only)") {
    import spark.implicits._
    val jpegs = spark.range(0, 8).map { i =>
      val img = Multimodal.ImageCodec.decode(
        Multimodal.ImageCodec.encodeGrayPng(
          32, 24, (x, y) => (x * 3 + y * 5 + i.toInt) % 256))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      MediaRecord(i, "image/jpeg", bos.toByteArray)
    }
    val got = Multimodal.decodeImages(jpegs).collect()
    assert(got.length == 8)
    got.foreach { f =>
      assert(f.width == 32 && f.height == 24)
      assert(f.hist.sum == 32L * 24)
    }
  }
}
