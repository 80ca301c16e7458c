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

  /** Sliding chunk windows over the blob stand-in (stride 512, width
    * 1024) with per-chunk content checksums — the chunk-store ingest
    * shape: media split into fixed-stride windows whose hashes feed
    * chunk-level dedup/caching. Unlike [[frameSample]]'s stub frame
    * hashes, each checksum here covers the ACTUAL window content.
    * Char-addressed (not byte): DuckDB has no BLOB substring, and
    * character windows agree across engines for any encoding. Narrow:
    * sequence+explode per doc, one projection, no shuffle before the
    * final order.
    */
  def blobChunks(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "documents")
      // empty blobs yield zero chunks, stated EXPLICITLY on both
      // sides: the implicit formulas diverge on len=0 (Spark's cast
      // truncates toward zero where DuckDB's // floors, and a
      // backwards sequence() range throws)
      .where(length(col("text")) > 0)
      .select(
        col("doc_id"), col("text"),
        (lit(1L) + (length(col("text")) - 1).cast("long") / 512)
          .cast("long").as("nw"))
      .select(
        col("doc_id"), col("text"),
        explode(sequence(lit(0L), col("nw") - 1)).as("w"))
      .select(
        col("doc_id"),
        col("w").as("chunk_idx"),
        (col("w") * 512 + 1).as("offset"),
        length(expr("substring(text, CAST(w * 512 + 1 AS INT), 1024)"))
          .cast("long").as("chunk_len"),
        md5(expr("substring(text, CAST(w * 512 + 1 AS INT), 1024)"))
          .as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")

  def blobChunksOracle: String =
    """SELECT doc_id, CAST(w AS BIGINT) chunk_idx,
      |  CAST(w * 512 + 1 AS BIGINT) AS "offset",
      |  CAST(length(substring(text, w * 512 + 1, 1024)) AS BIGINT) chunk_len,
      |  md5(substring(text, w * 512 + 1, 1024)) chunk_hash
      |FROM documents,
      |  unnest(range(0, 1 + (length(text) - 1) // 512)) t(w)
      |WHERE length(text) > 0
      |ORDER BY doc_id, chunk_idx""".stripMargin

  /** `image_features`: REAL image decode in the feature pipeline —
    * the one multimodal family where a true codec exists offline
    * (JDK ImageIO). Each document row becomes a deterministic gray
    * PNG (pixel(x,y) = (7x + 13y + 31·doc_id) mod 256, dimensions
    * keyed by doc_id), which the typed
    * [[graft.operators.Multimodal.decodeImages]] pipeline decodes
    * back to pixels and reduces to integer features: dimensions, a
    * 16-bin luminance histogram, corner luminances. PNG is lossless
    * and every feature is integer arithmetic, so DuckDB pins the
    * real decode bit-for-bit by recomputing the closed-form pixel
    * function — an engine bug anywhere in encode, decode, sampling
    * or binning hash-mismatches. Encode+decode run partition-local
    * (mapPartitions, codec init amortized); nothing shuffles until
    * the final order.
    */
  def imageFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    val ids = Tables.read(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
    val pngs = ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val w = 16 + (id % 16).toInt
        val h = 16 + (id % 8).toInt
        Multimodal.MediaRecord(
          id, "image/png",
          Multimodal.ImageCodec.encodeGrayPng(
            w, h, (x, y) => ((7L * x + 13L * y + 31L * id) % 256L).toInt))
      }
    }
    // hist restates as a comma-joined string: the driver comparator's
    // sort step cannot hash top-level array cells (no-ARRAY/MAP-output
    // contract, SURVEY §5.2); the Array[Long] surface stays pinned in
    // MultimodalSpec.
    Multimodal.decodeImages(pngs).toDF()
      .withColumn("hist", concat_ws(",", col("hist")))
      .orderBy("doc_id")
  }

  def imageFeaturesOracle: String =
    """WITH d AS (
      |  SELECT doc_id, 16 + doc_id % 16 AS w, 16 + doc_id % 8 AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, (7 * x + 13 * y + 31 * doc_id) % 256 AS v
      |  FROM d, unnest(range(0, w)) tx(x), unnest(range(0, h)) ty(y)),
      |bins AS (
      |  SELECT doc_id, v // 16 AS b, CAST(count(*) AS BIGINT) cnt
      |  FROM px GROUP BY 1, 2),
      |grid AS (
      |  SELECT doc_id, bb.b
      |  FROM d CROSS JOIN (SELECT unnest(range(0, 16)) AS b) bb),
      |hist AS (
      |  SELECT grid.doc_id,
      |    string_agg(CAST(COALESCE(bins.cnt, 0) AS VARCHAR), ','
      |      ORDER BY grid.b) AS hist
      |  FROM grid
      |  LEFT JOIN bins ON bins.doc_id = grid.doc_id AND bins.b = grid.b
      |  GROUP BY grid.doc_id)
      |SELECT d.doc_id, CAST(d.w AS BIGINT) width, CAST(d.h AS BIGINT) height,
      |  hist.hist,
      |  (31 * d.doc_id) % 256 AS c00,
      |  (7 * (d.w - 1) + 31 * d.doc_id) % 256 AS cw0,
      |  (13 * (d.h - 1) + 31 * d.doc_id) % 256 AS c0h,
      |  (7 * (d.w - 1) + 13 * (d.h - 1) + 31 * d.doc_id) % 256 AS cwh
      |FROM d JOIN hist ON d.doc_id = hist.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** `audio_features`: REAL audio decode in the feature pipeline —
    * the audio sibling of [[imageFeatures]], on the other true codec
    * that exists offline (JDK `javax.sound.sampled`, WAV/PCM). Each
    * document row becomes a deterministic 16-bit mono PCM WAV
    * (sample(i) = ((37·i + 11·doc_id) mod 2001) − 1000, length keyed
    * by doc_id), which the typed
    * [[graft.operators.Multimodal.decodeAudio]] pipeline decodes back
    * to samples and reduces to integer features: sample count, peak
    * amplitude, Σ|s|, energy Σs², zero crossings. WAV is lossless and
    * every feature is integer arithmetic, so DuckDB pins the real
    * decode bit-for-bit from the closed-form sample function — a bug
    * anywhere in the WAV header, byte order, encode or decode
    * hash-mismatches (n_samples itself checks the round-trip length).
    * Encode+decode run partition-local; nothing shuffles until the
    * final order.
    */
  def audioFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    val ids = Tables.read(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
    val wavs = ids.mapPartitions { it =>
      it.map { id =>
        val n = 64 + (id % 64).toInt
        Multimodal.MediaRecord(
          id, "audio/wav",
          Multimodal.AudioCodec.encodePcm16Wav(
            n, i => (((37L * i + 11L * id) % 2001L) - 1000L).toInt))
      }
    }
    Multimodal.decodeAudio(wavs).toDF().orderBy("doc_id")
  }

  def audioFeaturesOracle: String =
    """WITH d AS (
      |  SELECT doc_id, 64 + doc_id % 64 AS n FROM documents),
      |s AS (
      |  SELECT doc_id, i,
      |    (37 * i + 11 * doc_id) % 2001 - 1000 AS v,
      |    CASE WHEN i > 0
      |      THEN (37 * (i - 1) + 11 * doc_id) % 2001 - 1000 END AS vp
      |  FROM d, unnest(range(0, n)) t(i))
      |SELECT doc_id, CAST(count(*) AS BIGINT) n_samples,
      |  CAST(max(abs(v)) AS BIGINT) peak,
      |  CAST(sum(abs(v)) AS BIGINT) sum_abs,
      |  CAST(sum(v * v) AS BIGINT) energy,
      |  CAST(sum(CASE WHEN (vp < 0) <> (v < 0) THEN 1 ELSE 0 END)
      |    AS BIGINT) zero_crossings
      |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** `video_features`: REAL video demux in the feature pipeline —
    * completing the multimodal triad (image: ImageIO, audio:
    * javax.sound, video: this). No video codec ships offline, but
    * YUV4MPEG2 needs none: text header + raw planar frames, and the
    * demux — header tokenization, FRAME markers, C420 plane-size
    * arithmetic — is the real work a production pipeline gets wrong.
    * Each document row becomes a deterministic Y4M clip (Y(f,x,y) =
    * (11f+7x+13y+31·doc_id) mod 256 and analogous chroma planes,
    * dimensions/frame-count keyed by doc_id), which
    * [[graft.operators.Multimodal.decodeVideos]] parses back and
    * reduces to integer features: dimensions + frame count (header
    * parse), per-plane sums (stride/offset accounting — a U/V swap
    * mismatches), max per-frame luma, inter-frame motion. Y4M is
    * lossless and every feature is integer, so DuckDB pins the whole
    * encode→demux→reduce path bit-for-bit from the closed-form pixel
    * functions. Encode+demux run partition-local; only the 9-column
    * feature row shuffles to the final order.
    */
  def videoFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    val ids = Tables.read(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
    val clips = ids.mapPartitions { it =>
      it.map { id =>
        val w = 8 + (id % 4).toInt * 2
        val h = 6 + (id % 3).toInt * 2
        val nf = 2 + (id % 4).toInt
        Multimodal.MediaRecord(
          id, "video/x-yuv4mpeg2",
          Multimodal.VideoCodec.encodeY4m(
            w, h, nf,
            (f, x, y) => ((11L * f + 7L * x + 13L * y + 31L * id) % 256L).toInt,
            (f, x, y) => ((5L * f + 3L * x + y + 17L * id) % 256L).toInt,
            (f, x, y) => ((3L * f + x + 2L * y + 23L * id) % 256L).toInt))
      }
    }
    Multimodal.decodeVideos(clips).toDF().orderBy("doc_id")
  }

  def videoFeaturesOracle: String =
    """WITH d AS (
      |  SELECT doc_id, 8 + (doc_id % 4) * 2 AS w,
      |    6 + (doc_id % 3) * 2 AS h, 2 + doc_id % 4 AS nf
      |  FROM documents),
      |py AS (
      |  SELECT doc_id, f,
      |    (11 * f + 7 * x + 13 * y + 31 * doc_id) % 256 AS v,
      |    CASE WHEN f > 0
      |      THEN (11 * (f - 1) + 7 * x + 13 * y + 31 * doc_id) % 256
      |    END AS vp
      |  FROM d, unnest(range(0, nf)) tf(f),
      |    unnest(range(0, w)) tx(x), unnest(range(0, h)) ty(y)),
      |fy AS (
      |  SELECT doc_id, f, SUM(v) fsum,
      |    SUM(CASE WHEN vp IS NULL THEN 0 ELSE abs(v - vp) END) fdiff
      |  FROM py GROUP BY 1, 2),
      |yagg AS (
      |  SELECT doc_id, CAST(SUM(fsum) AS BIGINT) y_sum,
      |    CAST(MAX(fsum) AS BIGINT) max_frame_y,
      |    CAST(SUM(fdiff) AS BIGINT) motion
      |  FROM fy GROUP BY 1),
      |cagg AS (
      |  SELECT doc_id,
      |    CAST(SUM((5 * f + 3 * x + y + 17 * doc_id) % 256) AS BIGINT)
      |      u_sum,
      |    CAST(SUM((3 * f + x + 2 * y + 23 * doc_id) % 256) AS BIGINT)
      |      v_sum
      |  FROM d, unnest(range(0, nf)) tf(f),
      |    unnest(range(0, w // 2)) tx(x), unnest(range(0, h // 2)) ty(y)
      |  GROUP BY 1)
      |SELECT d.doc_id, CAST(w AS BIGINT) width, CAST(h AS BIGINT) height,
      |  CAST(nf AS BIGINT) n_frames, y_sum, u_sum, v_sum,
      |  max_frame_y, motion
      |FROM d JOIN yagg USING (doc_id) JOIN cagg USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** `chunk_dedup_ratio`: content-addressable-store savings per feed —
    * the blob chunks from [[blobChunks]]'s windowing (stride 512,
    * width 1024) keyed by content hash, counted total vs distinct per
    * source. This is the dedup economics of a chunk store: a 100 TB
    * media corpus with repeated intros/headers/padding stores only
    * distinct chunks, and savings_ppm per feed is the "which sources
    * re-upload the same bytes" readout (the multimodal sibling of
    * `dup_rate_by_source`).
    *
    * Plan shape: narrow window explode → ONE source-grain aggregate
    * with a count-distinct on the chunk hash. At scale the distinct
    * count is the cost center; swap in the suite's KMV/bitmap
    * machinery if exactness-per-feed can relax — the panel's schema
    * doesn't change.
    */
  def chunkDedupRatio(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "documents")
      .where(length(col("text")) > 0)
      .select(
        col("source"), col("text"),
        (lit(1L) + (length(col("text")) - 1).cast("long") / 512)
          .cast("long").as("nw"))
      .select(
        col("source"), col("text"),
        explode(sequence(lit(0L), col("nw") - 1)).as("w"))
      .select(
        col("source"),
        md5(expr("substring(text, CAST(w * 512 + 1 AS INT), 1024)"))
          .as("chunk_hash"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_chunks"),
        countDistinct(col("chunk_hash")).as("n_distinct"))
      .select(
        col("source"), col("n_chunks"), col("n_distinct"),
        expr("(n_chunks - n_distinct) * 1000000 div n_chunks")
          .as("savings_ppm"))
      .orderBy("source")

  def chunkDedupRatioOracle: String =
    """WITH ch AS (
      |  SELECT source, md5(substring(text, w * 512 + 1, 1024)) chunk_hash
      |  FROM documents,
      |    unnest(range(0, 1 + (length(text) - 1) // 512)) t(w)
      |  WHERE length(text) > 0)
      |SELECT source, CAST(count(*) AS BIGINT) n_chunks,
      |  CAST(count(DISTINCT chunk_hash) AS BIGINT) n_distinct,
      |  (count(*) - count(DISTINCT chunk_hash)) * 1000000 // count(*) savings_ppm
      |FROM ch GROUP BY 1 ORDER BY source""".stripMargin

  /** `image_phash_dedup`: the multimodal×dedup composition — a
    * perceptual AVERAGE-HASH (aHash) near-dup join over REALLY
    * decoded images. Same deterministic synthetic PNGs as
    * [[imageFeatures]] (pixel formula known to both engines, PNG
    * lossless), but the engine path exercises the full production
    * pipeline: encode → ImageIO decode → 8×8 block-mean downsample
    * (pixel→block by (8x) div w, block mean and the global
    * threshold both FLOOR — integer-exact) → 64-bit hash as two
    * 32-bit halves (hi/lo, sign-safe in both engines) → banded
    * candidate join (4×16-bit bands: the simhash_recall PIGEONHOLE
    * identity — any pair within Hamming 3 shares a clean band, so
    * the ≤3 output is COMPLETE without an all-pairs join) → verify
    * `bit_count(xor)`. DuckDB replays hash construction from the
    * closed-form pixels and verifies via brute-force pairs — engine
    * banding vs oracle exhaustion agreeing IS the completeness
    * proof, re-proven at every scale the gate runs.
    *
    * Plan shape: codec work partition-local (mapPartitions, the
    * legitimate use); hashes are 1 row/doc; the near-dup relation is
    * emitted at HASH-CLASS grain, not doc-pair grain — docs collapse
    * to their (hi, lo) class first (rep = min doc_id, size n), the
    * banded join runs over DISTINCT hashes only, and each row
    * carries the doc-pair MASS (nₐ·n_b, or n·(n−1)/2 within a class
    * at Hamming 0) instead of enumerating it. The first cut listed
    * doc pairs and went quadratic on the salted sf1 replica
    * (~200-member identical-image classes ⇒ 15M pairs, 46× cost at
    * 10× — measured, then fixed); class grain is what a production
    * dedup ships: output bounded by distinct image CONTENT,
    * invariant to copy count. At 100 TB the image bytes never
    * shuffle — only the 16-byte hash relation does.
    */
  def imagePhashDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    val ids = Tables.read(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
    val hashes = ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val w = 16 + (id % 16).toInt
        val h = 16 + (id % 8).toInt
        val png = Multimodal.ImageCodec.encodeGrayPng(
          w, h, (x, y) => ((7L * x + 13L * y + 31L * id) % 256L).toInt)
        val img = Multimodal.ImageCodec.decode(png)
        val sums = Array.ofDim[Long](8, 8)
        val cnts = Array.ofDim[Long](8, 8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val bi = 8 * x / w; val bj = 8 * y / h
            sums(bj)(bi) += Multimodal.ImageCodec.luminance(img, x, y)
            cnts(bj)(bi) += 1
            x += 1
          }
          y += 1
        }
        val means = for (j <- 0 until 8; i <- 0 until 8)
          yield sums(j)(i) / cnts(j)(i)
        val thr = means.sum / 64
        var hi = 0L; var lo = 0L
        means.zipWithIndex.foreach { case (m, b) =>
          if (m >= thr) {
            if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
          }
        }
        (id, hi, lo)
      }
    }.toDF("doc_id", "hi", "lo")
    val classes = hashes.groupBy(col("hi"), col("lo"))
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("n"))
      .localCheckpoint(eager = false) // within rows + both join sides
    val within = classes.where(col("n") >= 2)
      .select(
        col("rep").as("rep_a"), col("rep").as("rep_b"),
        lit(0L).as("hamming"),
        expr("n * (n - 1) div 2").as("n_pairs"))
    val bands = classes.select(
      col("rep"), col("n"), col("hi"), col("lo"),
      explode(array(
        concat_ws(":", lit(0), expr("hi div 65536")),
        concat_ws(":", lit(1), expr("hi % 65536")),
        concat_ws(":", lit(2), expr("lo div 65536")),
        concat_ws(":", lit(3), expr("lo % 65536")))).as("bkey"))
    val cross = bands.select(
        col("bkey"), col("rep").as("rep_a"), col("n").as("na"),
        col("hi").as("ha"), col("lo").as("la"))
      .join(
        bands.select(
          col("bkey"), col("rep").as("rep_b"), col("n").as("nb"),
          col("hi").as("hb"), col("lo").as("lb")),
        Seq("bkey"))
      .where(col("rep_a") < col("rep_b"))
      .select(col("rep_a"), col("rep_b"),
        (expr("bit_count(ha ^ hb)") + expr("bit_count(la ^ lb)"))
          .cast("long").as("hamming"),
        (col("na") * col("nb")).as("n_pairs"))
      .where(col("hamming") <= 3)
      .distinct()
    within.unionByName(cross).orderBy("rep_a", "rep_b")
  }

  def imagePhashDedupOracle: String =
    """WITH d AS (
      |  SELECT doc_id, 16 + doc_id % 16 AS w, 16 + doc_id % 8 AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, (8 * x) // w bi, (8 * y) // h bj,
      |    (7 * x + 13 * y + 31 * doc_id) % 256 AS v
      |  FROM d, unnest(range(0, w)) tx(x), unnest(range(0, h)) ty(y)),
      |blocks AS (
      |  SELECT doc_id, bj * 8 + bi AS b,
      |    CAST(SUM(v) AS BIGINT) // CAST(count(*) AS BIGINT) m
      |  FROM px GROUP BY 1, 2),
      |thr AS (
      |  SELECT doc_id, CAST(SUM(m) AS BIGINT) // 64 t
      |  FROM blocks GROUP BY 1),
      |hash AS (
      |  SELECT blocks.doc_id,
      |    CAST(SUM(CASE WHEN m >= t AND b >= 32
      |      THEN (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END) AS BIGINT) hi,
      |    CAST(SUM(CASE WHEN m >= t AND b < 32
      |      THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) lo
      |  FROM blocks JOIN thr ON blocks.doc_id = thr.doc_id
      |  GROUP BY 1),
      |cls AS (
      |  SELECT hi, lo, MIN(doc_id) rep, CAST(count(*) AS BIGINT) n
      |  FROM hash GROUP BY hi, lo),
      |within AS (
      |  SELECT rep rep_a, rep rep_b, CAST(0 AS BIGINT) hamming,
      |    n * (n - 1) // 2 n_pairs
      |  FROM cls WHERE n >= 2),
      |crossp AS (
      |  SELECT x.rep rep_a, y.rep rep_b,
      |    CAST(bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo))
      |      AS BIGINT) hamming,
      |    x.n * y.n n_pairs
      |  FROM cls x JOIN cls y ON x.rep < y.rep
      |  WHERE bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo)) <= 3)
      |SELECT * FROM within UNION ALL SELECT * FROM crossp
      |ORDER BY rep_a, rep_b""".stripMargin

  /** `video_scene_cuts`: shot-boundary detection over REALLY demuxed
    * Y4M clips — the per-frame grain [[videoFeatures]] cannot express
    * (its `motion` is the clip-total; a cut detector needs WHERE the
    * spike is). Clips are synthesized with an explicit scene
    * structure: the luma formula carries a 97·(f div 2) scene offset,
    * so consecutive frames inside a scene differ by the small motion
    * term while frames across a scene boundary jump by ~97 gray
    * levels (mod-256 wraps keep both sides honest — the oracle
    * replays the exact pixel arithmetic, not the intent). A frame is
    * a cut when its Σ|Y_f − Y_{f−1}| exceeds 64 per pixel — between
    * the ~21/pixel within-scene and ~100/pixel across-scene means at
    * every doc geometry. Integer end to end.
    *
    * Plan shape: encode+demux partition-local via
    * [[graft.operators.Multimodal.decodeVideoFrameStats]] (4-long
    * frame rows are all that shuffles), ONE doc-grain aggregate.
    */
  def videoSceneCuts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    val ids = Tables.read(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
    val clips = ids.mapPartitions { it =>
      it.map { id =>
        val w = 8 + (id % 4).toInt * 2
        val h = 6 + (id % 3).toInt * 2
        val nf = 4 + (id % 3).toInt * 2
        Multimodal.MediaRecord(
          id, "video/x-yuv4mpeg2",
          Multimodal.VideoCodec.encodeY4m(
            w, h, nf,
            (f, x, y) =>
              ((97L * (f / 2) + 11L * f + 7L * x + 13L * y + 31L * id)
                % 256L).toInt,
            (f, x, y) => ((5L * f + 3L * x + y + 17L * id) % 256L).toInt,
            (f, x, y) => ((3L * f + x + 2L * y + 23L * id) % 256L).toInt))
      }
    }
    Multimodal.decodeVideoFrameStats(clips).toDF()
      .withColumn(
        "npix",
        (lit(8L) + (col("doc_id") % 4) * 2) *
          (lit(6L) + (col("doc_id") % 3) * 2))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_frames"),
        sum(when(col("f") > 0 && col("diff_prev") > lit(64L) * col("npix"), 1L)
          .otherwise(0L)).as("n_cuts"),
        min(when(col("f") > 0 && col("diff_prev") > lit(64L) * col("npix"),
          col("f"))).as("first_cut"),
        max(col("diff_prev")).as("max_diff"))
      .select(
        col("doc_id"), col("n_frames"), col("n_cuts"),
        col("first_cut"), col("max_diff"),
        (col("n_cuts") + 1).as("n_scenes"))
      .orderBy("doc_id")
  }

  def videoSceneCutsOracle: String =
    """WITH d AS (
      |  SELECT doc_id, 8 + (doc_id % 4) * 2 AS w,
      |    6 + (doc_id % 3) * 2 AS h, 4 + (doc_id % 3) * 2 AS nf
      |  FROM documents),
      |py AS (
      |  SELECT doc_id, w, h, f,
      |    (97 * (f // 2) + 11 * f + 7 * x + 13 * y + 31 * doc_id) % 256 AS v,
      |    CASE WHEN f > 0
      |      THEN (97 * ((f - 1) // 2) + 11 * (f - 1) + 7 * x + 13 * y
      |        + 31 * doc_id) % 256
      |    END AS vp
      |  FROM d, unnest(range(0, nf)) tf(f),
      |    unnest(range(0, w)) tx(x), unnest(range(0, h)) ty(y)),
      |fr AS (
      |  SELECT doc_id, w, h, f,
      |    SUM(CASE WHEN vp IS NULL THEN 0 ELSE abs(v - vp) END) fdiff
      |  FROM py GROUP BY 1, 2, 3, 4),
      |agg AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) n_frames,
      |    CAST(sum(CASE WHEN f > 0 AND fdiff > 64 * w * h THEN 1 ELSE 0 END)
      |      AS BIGINT) n_cuts,
      |    CAST(min(CASE WHEN f > 0 AND fdiff > 64 * w * h THEN f END)
      |      AS BIGINT) first_cut,
      |    CAST(max(fdiff) AS BIGINT) max_diff
      |  FROM fr GROUP BY 1)
      |SELECT doc_id, n_frames, n_cuts, first_cut, max_diff,
      |  n_cuts + 1 AS n_scenes
      |FROM agg ORDER BY doc_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "video_scene_cuts", videoSceneCuts, Some(videoSceneCutsOracle)),
    QueryDef(
      "image_phash_dedup", imagePhashDedup, Some(imagePhashDedupOracle)),
    QueryDef(
      "chunk_dedup_ratio", chunkDedupRatio, Some(chunkDedupRatioOracle)),
    QueryDef(
      "multimodal_features",
      multimodalFeatures,
      Some(multimodalFeaturesOracle)),
    QueryDef("frame_sample", frameSample, Some(frameSampleOracle)),
    QueryDef("image_features", imageFeatures, Some(imageFeaturesOracle)),
    QueryDef("audio_features", audioFeatures, Some(audioFeaturesOracle)),
    QueryDef("video_features", videoFeatures, Some(videoFeaturesOracle)),
    QueryDef("blob_chunks", blobChunks, Some(blobChunksOracle)))
}
