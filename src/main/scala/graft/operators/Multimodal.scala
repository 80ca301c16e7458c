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
  * closed-form pixel function of its synthetic inputs. AUDIO decodes
  * for real too ([[AudioCodec]], JDK `javax.sound` WAV/PCM), and VIDEO
  * via [[VideoCodec]] — YUV4MPEG2, the uncompressed interchange format
  * whose demux is pure byte accounting, so no codec library is needed.
  * [[StubCodec]] remains only for the generic any-media plumbing shape
  * (extractFeatures/resize/sampleFrames), where a compressed-codec
  * swap-in changes no schema, batching or partitioning.
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

  /** Real audio codec on JDK `javax.sound.sampled` (the WAV/PCM
    * reader+writer ships in java.desktop, available offline — the
    * audio sibling of [[ImageCodec]]'s ImageIO). 16-bit signed PCM
    * mono throughout: WAV is lossless, so encode→decode round-trips
    * samples EXACTLY, and every feature below is integer arithmetic —
    * which is what makes the `audio_features` query DuckDB-oracle-
    * checkable against the closed-form sample function of its
    * synthetic inputs.
    */
  object AudioCodec {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    val SampleRate = 8000f

    /** Deterministic 16-bit mono WAV: sample(i) = f(i) clamped to
      * short range, little-endian PCM.
      */
    def encodePcm16Wav(n: Int, f: Int => Int): Array[Byte] = {
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val s = math.max(Short.MinValue.toInt, math.min(Short.MaxValue.toInt, f(i)))
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(
        AudioFormat.Encoding.PCM_SIGNED, SampleRate, 16, 1, 2, SampleRate,
        /* bigEndian = */ false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** WAV bytes -> signed 16-bit samples. Fails loudly on anything
      * that isn't the 16-bit mono PCM this pipeline carries — a
      * silent format coercion would corrupt every downstream feature.
      */
    def decodePcm16(bytes: Array[Byte]): Array[Int] = {
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      require(
        fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"expected 16-bit mono signed PCM, got $fmt")
      val pcm = ais.readAllBytes()
      val n = pcm.length / 2
      val out = new Array[Int](n)
      var i = 0
      if (fmt.isBigEndian)
        while (i < n) { out(i) = (pcm(2 * i) << 8) | (pcm(2 * i + 1) & 0xff); i += 1 }
      else
        while (i < n) { out(i) = (pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff); i += 1 }
      out
    }
  }

  final case class AudioFeatures(
      doc_id: Long,
      n_samples: Long,
      peak: Long,
      sum_abs: Long,
      energy: Long,
      zero_crossings: Long)

  implicit private val audioFeatEnc: Encoder[AudioFeatures] =
    Encoders.product[AudioFeatures]

  /** Real WAV byte column -> decoded integer features: sample count,
    * peak |amplitude|, Σ|s|, Σs² (energy; int64 headroom: 32767² ×
    * 10⁹ samples < 2⁶³), and zero crossings (sign(s[i]) flips vs
    * s[i-1], zero counted as non-negative). One decode per row,
    * partition-local; nothing shuffles.
    */
  def decodeAudio(records: Dataset[MediaRecord]): Dataset[AudioFeatures] =
    records.mapPartitions { it =>
      it.map { rec =>
        val s = AudioCodec.decodePcm16(rec.content)
        var peak = 0L; var sumAbs = 0L; var energy = 0L; var zc = 0L
        var i = 0
        while (i < s.length) {
          val v = s(i).toLong
          val a = math.abs(v)
          if (a > peak) peak = a
          sumAbs += a
          energy += v * v
          if (i > 0 && ((s(i - 1) < 0) != (v < 0))) zc += 1
          i += 1
        }
        AudioFeatures(rec.doc_id, s.length.toLong, peak, sumAbs, energy, zc)
      }
    }

  /** Real video container on YUV4MPEG2 (Y4M): a plain-text header
    * (`YUV4MPEG2 W.. H.. F.. C..`) followed by `FRAME`-delimited RAW
    * planar YUV — the one video format that needs no codec library,
    * only exact byte accounting, so it works offline and round-trips
    * LOSSLESSLY (mplayer/ffmpeg's uncompressed interchange format).
    * 4:2:0 chroma (C420: U and V at half resolution both ways, so W
    * and H must be even). Parsing is real demux work: header
    * tokenization, per-frame optional parameters, plane-size
    * arithmetic, truncation detection — a wrong stride or a missed
    * frame marker corrupts every downstream feature, which is exactly
    * what the oracle pin catches.
    */
  object VideoCodec {
    /** One parsed clip: planar frames, each (Y, U, V) with Y of
      * width×height bytes and U/V of (width/2)×(height/2).
      */
    final case class VideoClip(
        width: Int,
        height: Int,
        frames: Array[(Array[Byte], Array[Byte], Array[Byte])])

    /** Deterministic Y4M writer: plane(f, x, y) functions evaluated on
      * each plane's own grid (chroma on the quarter grid). C420 frame
      * rate 25:1 progressive — header fields real, not decorative: the
      * parser re-derives plane sizes from them.
      */
    def encodeY4m(
        w: Int, h: Int, nFrames: Int,
        yF: (Int, Int, Int) => Int,
        uF: (Int, Int, Int) => Int,
        vF: (Int, Int, Int) => Int): Array[Byte] = {
      require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0,
        s"C420 needs positive even dimensions, got ${w}x$h")
      require(nFrames > 0, s"clip needs at least one frame, got $nFrames")
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(
        s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII"))
      var f = 0
      while (f < nFrames) {
        bos.write("FRAME\n".getBytes("US-ASCII"))
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { bos.write(yF(f, x, y) & 0xff); x += 1 }
          y += 1
        }
        var cy = 0
        while (cy < h / 2) {
          var cx = 0
          while (cx < w / 2) { bos.write(uF(f, cx, cy) & 0xff); cx += 1 }
          cy += 1
        }
        cy = 0
        while (cy < h / 2) {
          var cx = 0
          while (cx < w / 2) { bos.write(vF(f, cx, cy) & 0xff); cx += 1 }
          cy += 1
        }
        f += 1
      }
      bos.toByteArray
    }

    /** Y4M bytes -> parsed clip. Fails loudly on a malformed magic,
      * odd-dimension C420, an unsupported colorspace, or a truncated
      * plane — silent partial frames would corrupt every feature.
      */
    def decodeY4m(bytes: Array[Byte]): VideoClip = {
      var pos = 0
      def readLine(): String = {
        val start = pos
        while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        require(pos < bytes.length, "truncated Y4M header line")
        val s = new String(bytes, start, pos - start, "US-ASCII")
        pos += 1
        s
      }
      val header = readLine()
      val toks = header.split(' ')
      require(toks.head == "YUV4MPEG2", s"not a Y4M stream: ${toks.head}")
      var w = -1; var h = -1; var cs = "420jpeg" // Y4M default colorspace
      toks.tail.foreach { t =>
        if (t.nonEmpty) t.charAt(0) match {
          case 'W' => w = t.substring(1).toInt
          case 'H' => h = t.substring(1).toInt
          case 'C' => cs = t.substring(1)
          case _ => () // F/I/A/X params: legal, irrelevant to demux
        }
      }
      require(w > 0 && h > 0, s"Y4M header missing dimensions: $header")
      val (cw, ch) = cs match {
        case s if s.startsWith("420") =>
          require(w % 2 == 0 && h % 2 == 0,
            s"C420 with odd dimensions ${w}x$h")
          (w / 2, h / 2)
        case "mono" => (0, 0)
        case other => throw new IllegalArgumentException(
          s"unsupported Y4M colorspace C$other")
      }
      val frames = Array.newBuilder[(Array[Byte], Array[Byte], Array[Byte])]
      def readPlane(n: Int): Array[Byte] = {
        require(pos + n <= bytes.length, "truncated Y4M plane")
        val p = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
        pos += n
        p
      }
      while (pos < bytes.length) {
        val marker = readLine()
        require(marker == "FRAME" || marker.startsWith("FRAME "),
          s"expected FRAME marker, got: $marker")
        frames += ((readPlane(w * h), readPlane(cw * ch), readPlane(cw * ch)))
      }
      val fs = frames.result()
      require(fs.nonEmpty, "Y4M stream with zero frames")
      VideoClip(w, h, fs)
    }
  }

  final case class VideoFeatures(
      doc_id: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      y_sum: Long,
      u_sum: Long,
      v_sum: Long,
      max_frame_y: Long,
      motion: Long)

  implicit private val videoFeatEnc: Encoder[VideoFeatures] =
    Encoders.product[VideoFeatures]

  /** Real Y4M byte column -> decoded integer features: dimensions +
    * frame count (pins header parse and frame accounting), per-plane
    * byte sums (pins plane offsets/strides — a U/V swap or off-by-one
    * mismatches), the max per-frame luma sum, and motion =
    * Σ_{f>0}Σ|Y_f − Y_{f−1}| (pins inter-frame alignment). All int64:
    * 255 × 2²⁴ px × 10⁴ frames < 2⁶³. One demux per row,
    * partition-local; only the 9-long feature row ever shuffles.
    */
  def decodeVideos(records: Dataset[MediaRecord]): Dataset[VideoFeatures] =
    records.mapPartitions { it =>
      it.map { rec =>
        val clip = VideoCodec.decodeY4m(rec.content)
        var ySum = 0L; var uSum = 0L; var vSum = 0L
        var maxFrameY = Long.MinValue; var motion = 0L
        var prevY: Array[Byte] = null
        clip.frames.foreach { case (yp, up, vp) =>
          var fy = 0L
          var i = 0
          while (i < yp.length) {
            val v = yp(i) & 0xff
            fy += v
            if (prevY != null) motion += math.abs(v - (prevY(i) & 0xff))
            i += 1
          }
          ySum += fy
          if (fy > maxFrameY) maxFrameY = fy
          i = 0
          while (i < up.length) { uSum += up(i) & 0xff; i += 1 }
          i = 0
          while (i < vp.length) { vSum += vp(i) & 0xff; i += 1 }
          prevY = yp
        }
        VideoFeatures(
          rec.doc_id, clip.width.toLong, clip.height.toLong,
          clip.frames.length.toLong, ySum, uSum, vSum, maxFrameY, motion)
      }
    }

  final case class VideoFrameStats(
      doc_id: Long,
      f: Long,
      y_sum: Long,
      diff_prev: Long)

  implicit private val videoFrameEnc: Encoder[VideoFrameStats] =
    Encoders.product[VideoFrameStats]

  /** Real Y4M byte column -> PER-FRAME luma stats: frame index, luma
    * sum, and Σ|Y_f − Y_{f−1}| against the previous frame (0 for the
    * first). The per-frame grain is what shot-boundary detection
    * consumes — [[decodeVideos]] folds the whole clip to one row and
    * cannot say WHERE the motion spiked. Demux is partition-local;
    * only the 4-long frame rows shuffle.
    */
  def decodeVideoFrameStats(
      records: Dataset[MediaRecord]): Dataset[VideoFrameStats] =
    records.flatMap { rec =>
      val clip = VideoCodec.decodeY4m(rec.content)
      var prevY: Array[Byte] = null
      clip.frames.iterator.zipWithIndex.map { case ((yp, _, _), f) =>
        var fy = 0L
        var diff = 0L
        var i = 0
        while (i < yp.length) {
          val v = yp(i) & 0xff
          fy += v
          if (prevY != null) diff += math.abs(v - (prevY(i) & 0xff))
          i += 1
        }
        prevY = yp
        VideoFrameStats(rec.doc_id, f.toLong, fy, diff)
      }.toSeq
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
