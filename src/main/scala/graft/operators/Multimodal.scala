package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Multimodal-column operators: media (image/audio/video) is carried
  * as opaque `binary` columns with typed metadata; decode / feature
  * extraction runs as a typed `mapPartitions` pipeline so per-partition
  * codec initialization amortizes across rows (the Scala analog of a
  * batched pandas-UDF stage).
  *
  * IMAGES decode for real: [[ImageCodec]] is JDK `ImageIO` (PNG/JPEG,
  * available offline) — actual pixel decode, nearest-neighbor
  * downsample, integer luminance histograms, all integer-exact so the
  * `image_features` query is DuckDB-oracle-checkable against the
  * closed-form pixel function of its synthetic inputs. AUDIO/VIDEO
  * codecs are not in this container, so [[StubCodec]] still stands in
  * for those media types with a deterministic fake; swapping it for a
  * real codec changes no plumbing (same schema, batching,
  * partitioning).
  */
object Multimodal {

  /** Real image codec on JDK ImageIO. Gray 8-bit throughout: PNG is
    * lossless, so encode→decode round-trips pixels EXACTLY, which is
    * what makes real-decode features oracle-checkable. All sampling
    * is integer arithmetic (no resampling filters) for the same
    * reason.
    */
  object ImageCodec {
    import java.awt.image.BufferedImage

    /** Deterministic gray PNG: pixel(x,y) = f(x,y) & 0xff. */
    def encodeGrayPng(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { r.setSample(x, y, 0, f(x, y) & 0xff); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    def decode(bytes: Array[Byte]): BufferedImage = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, "undecodable image bytes")
      img
    }

    /** 8-bit luminance at (x,y): the gray sample for gray images,
      * integer (r+2g+b)/4 otherwise — integer-exact either way.
      */
    def luminance(img: BufferedImage, x: Int, y: Int): Int =
      if (img.getType == BufferedImage.TYPE_BYTE_GRAY)
        img.getRaster.getSample(x, y, 0)
      else {
        val rgb = img.getRGB(x, y)
        (((rgb >> 16) & 0xff) + 2 * ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 4
      }

    /** 16-bin integer luminance histogram (bin = v div 16). */
    def histogram16(img: BufferedImage): Array[Long] = {
      val hist = new Array[Long](16)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          hist(luminance(img, x, y) >> 4) += 1L
          x += 1
        }
        y += 1
      }
      hist
    }

    /** Nearest-neighbor downsample: out(i,j) = in(i·w div ow, j·h div
      * oh) — pure integer source indexing, no filtering, so the
      * output pixels are recomputable arithmetic over the input.
      */
    def downsampleNearest(
        img: BufferedImage, ow: Int, oh: Int): BufferedImage = {
      val out = new BufferedImage(ow, oh, BufferedImage.TYPE_BYTE_GRAY)
      val r = out.getRaster
      var j = 0
      while (j < oh) {
        var i = 0
        while (i < ow) {
          r.setSample(
            i, j, 0,
            luminance(img, i * img.getWidth / ow, j * img.getHeight / oh))
          i += 1
        }
        j += 1
      }
      out
    }
  }

  final case class ImageFeatures(
      doc_id: Long,
      width: Long,
      height: Long,
      hist: Array[Long],
      c00: Long,
      cw0: Long,
      c0h: Long,
      cwh: Long)

  implicit private val imgFeatEnc: Encoder[ImageFeatures] =
    Encoders.product[ImageFeatures]

  /** Real PNG/JPEG byte column -> decoded features (dimensions,
    * 16-bin luminance histogram, corner luminances). One ImageIO
    * config per partition (cache off: these are in-memory byte
    * arrays; the default disk-backed cache would add a temp-file
    * write per row).
    */
  def decodeImages(records: Dataset[MediaRecord]): Dataset[ImageFeatures] =
    records.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { rec =>
        val img = ImageCodec.decode(rec.content)
        val (w, h) = (img.getWidth, img.getHeight)
        ImageFeatures(
          rec.doc_id, w, h, ImageCodec.histogram16(img),
          ImageCodec.luminance(img, 0, 0),
          ImageCodec.luminance(img, w - 1, 0),
          ImageCodec.luminance(img, 0, h - 1),
          ImageCodec.luminance(img, w - 1, h - 1))
      }
    }

  /** Real image resize: decode, nearest-neighbor downsample, re-encode
    * PNG. Same schema/partitioning as the stub [[resize]] — the
    * swap-the-codec claim made concrete.
    */
  def resizeImages(
      records: Dataset[MediaRecord], w: Int, h: Int): Dataset[ResizedMedia] = {
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 26),
      s"resize dimensions ${w}x$h invalid or above the 64 MiB guard")
    records.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { rec =>
        val small = ImageCodec.downsampleNearest(
          ImageCodec.decode(rec.content), w, h)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(small, "png", bos)
        val out = bos.toByteArray
        ResizedMedia(rec.doc_id, w, h, out.length, out)
      }
    }
  }

  final case class MediaRecord(
      doc_id: Long,
      media_type: String,
      content: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Int,
      checksum: String,
      embedding: Array[Float],
      n_frames: Int)

  /** Deterministic fake codec. A real implementation would hold the
    * decoder context allocated once per partition (the expensive init
    * that motivates mapPartitions).
    */
  final class StubCodec {
    private val md = java.security.MessageDigest.getInstance("MD5")

    def checksum(bytes: Array[Byte]): String =
      md.digest(bytes).map("%02x".format(_)).mkString

    /** "Decode" to a fixed-dim embedding seeded by content. */
    def decode(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
      val d = md.digest(bytes)
      Array.tabulate(dim)(i => ((d(i % d.length) & 0xff) - 128) / 128.0f)
    }

    /** Frame-sample stub: frame count derived from length. */
    def frameCount(bytes: Array[Byte]): Int = 1 + bytes.length / 4096
  }

  final case class ResizedMedia(
      doc_id: Long,
      width: Int,
      height: Int,
      byte_len: Int,
      content: Array[Byte])

  final case class FrameSample(
      doc_id: Long,
      frame_idx: Int,
      byte_offset: Long,
      frame_hash: String)

  implicit private val featEnc: Encoder[MediaFeatures] =
    Encoders.product[MediaFeatures]
  implicit private val resizedEnc: Encoder[ResizedMedia] =
    Encoders.product[ResizedMedia]
  implicit private val frameEnc: Encoder[FrameSample] =
    Encoders.product[FrameSample]

  /** Binary records -> typed features; one codec per partition. */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] =
    records.mapPartitions { it =>
      val codec = new StubCodec // per-partition init, amortized
      it.map { r =>
        MediaFeatures(
          r.doc_id,
          r.media_type,
          r.content.length,
          codec.checksum(r.content),
          codec.decode(r.content),
          codec.frameCount(r.content))
      }
    }

  /** Binary -> binary resize plumbing (image thumbnailing shape): the
    * stub emits a deterministic w*h-byte "image" tiled from the
    * content digest; a real codec swaps in without touching schema,
    * batching or partitioning.
    */
  def resize(records: Dataset[MediaRecord], w: Int, h: Int): Dataset[ResizedMedia] = {
    // driver-side fail-fast: w*h overflowing Int would silently emit
    // a zero-byte "image" (2^32 wraps to 0) or crash each executor
    // task with NegativeArraySizeException
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 26),
      s"resize dimensions ${w}x$h invalid or above the 64 MiB guard")
    records.mapPartitions { it =>
      val codec = new StubCodec
      it.map { r =>
        val d = codec.checksum(r.content).getBytes
        val out = Array.tabulate(w * h)(i => d(i % d.length))
        ResizedMedia(r.doc_id, w, h, out.length, out)
      }
    }
  }

  /** Frame sampling (video shape): one media row fans out to one row
    * per sampled frame — index, byte offset into the stream, and a
    * per-frame content hash (stub: md5 of "checksum:idx"). The
    * flatMap-through-mapPartitions shape is exactly what a real
    * demuxer uses; frame explosion stays partition-local (no
    * shuffle).
    */
  def sampleFrames(records: Dataset[MediaRecord], every: Int): Dataset[FrameSample] = {
    // `every = 0` would throw "step cannot be 0" inside each executor
    // task; negative would silently sample nothing — fail at the call
    require(every > 0, s"frame sampling step must be positive, got $every")
    records.mapPartitions { it =>
      val codec = new StubCodec
      it.flatMap { r =>
        val cs = codec.checksum(r.content)
        (0 until codec.frameCount(r.content) by every).map { idx =>
          FrameSample(
            r.doc_id, idx, idx.toLong * 4096L,
            codec.checksum(s"$cs:$idx".getBytes("UTF-8")))
        }
      }
    }
  }
}
