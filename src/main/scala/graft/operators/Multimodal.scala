package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Multimodal-column operators: media (image/audio/video) is carried
  * as opaque `binary` columns with typed metadata; decode / feature
  * extraction runs as a typed `mapPartitions` pipeline so per-partition
  * codec initialization amortizes across rows (the Scala analog of a
  * batched pandas-UDF stage).
  *
  * The decode step itself is a STUB: media codecs are not available in
  * this environment, so [[StubCodec]] produces a deterministic fake
  * "decode" derived from the content bytes. Everything Spark-side —
  * the binary schema, the partition-wise batching, the typed feature
  * output, the partitioning behavior — is real and tested
  * (MultimodalSpec); swapping StubCodec for a real codec changes no
  * plumbing.
  */
object Multimodal {

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
