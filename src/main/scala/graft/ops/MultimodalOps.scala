package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, Deflater}

import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing (north-star: image/audio/video payloads in
  * a training-data pipeline). Media travels as an opaque `binary` column
  * with typed metadata extracted by a per-partition batch decoder.
  *
  * The payloads are REAL PNGs: zlib-deflated grayscale scanlines with
  * CRC32'd chunks (`java.util.zip` only — no new dependencies), decoded
  * by the JDK's own codec (`javax.imageio.ImageIO`), so the decode path
  * is a genuine third-party image library, not a parser written to match
  * the encoder. Two extension chunks ride along in spec-legal ancillary
  * form: APNG's public `acTL` (frame count; ImageIO ignores it, the
  * chunk walk reads it) and a private `grAf` chunk carrying the source
  * bytes (private ancillary chunk types are the PNG spec's extension
  * mechanism). The Spark-side shape — binary column, typed Dataset
  * in/out, partition-parallel batch decode, constant memory per task —
  * is the deliverable; swapping PNG for JPEG/audio means swapping
  * [[encodePng]]/[[decodePng]] only.
  */
object MultimodalOps {

  /** Decoded media metadata. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int, frames: Int)

  private def be4(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  /** One PNG chunk: length + type + data + CRC32(type ++ data). */
  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes(StandardCharsets.US_ASCII)
    val crc = new CRC32()
    crc.update(t)
    crc.update(data)
    be4(data.length) ++ t ++ data ++ be4(crc.getValue.toInt)
  }

  private val PngMagic =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** A complete valid PNG with the given geometry: 8-bit grayscale
    * (color type 0), one IDAT of zlib-deflated filter-0 scanlines whose
    * pixels cycle `data`, plus the `acTL` frame-count and `grAf`
    * source-bytes extension chunks. Exposed separately from
    * [[encodePng]] so tests can build a PNG whose fields CONTRADICT the
    * length formulas (parsed-not-derived proof). */
  def buildPng(width: Int, height: Int, frames: Int, data: Array[Byte]): Array[Byte] = {
    val raw = new Array[Byte](height * (1 + width))
    var idx = 0
    var y = 0
    while (y < height) {
      raw(idx) = 0 // filter type None per scanline
      idx += 1
      var x = 0
      while (x < width) {
        raw(idx) = if (data.isEmpty) 0 else data((y * width + x) % data.length)
        idx += 1
        x += 1
      }
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val idat = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) idat.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    PngMagic ++
      chunk("IHDR", be4(width) ++ be4(height) ++ Array[Byte](8, 0, 0, 0, 0)) ++
      chunk("acTL", be4(frames) ++ be4(0)) ++
      chunk("grAf", data) ++
      chunk("IDAT", idat.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Deterministic geometry from the source length (mirrored by the
    * oracle SQL): n bytes → (1 + n%64) × (1 + (n/64)%64), 1 + n%8
    * frames. The ENCODER evaluates these; the decoder reads the file. */
  def encodePng(data: Array[Byte]): Array[Byte] = {
    val n = data.length
    buildPng(1 + n % 64, 1 + (n / 64) % 64, 1 + n % 8, data)
  }

  /** Real codec decode: ImageIO (the JDK PNG reader — zlib inflate,
    * CRC checks, scanline unfiltering) yields the dimensions; a chunk
    * walk reads the `acTL` frame count and the `grAf` source length
    * that ImageIO (correctly) ignores as ancillary. */
  def decodePng(docId: Long, payload: Array[Byte]): MediaMeta = {
    require(payload.length >= 8 && (payload(0) & 0xFF) == 0x89 &&
      payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G',
      s"doc $docId: not a PNG payload")
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, s"doc $docId: ImageIO failed to decode payload")
    def be4at(off: Int): Int =
      ((payload(off) & 0xFF) << 24) | ((payload(off + 1) & 0xFF) << 16) |
        ((payload(off + 2) & 0xFF) << 8) | (payload(off + 3) & 0xFF)
    var frames = 1
    var nBytes = 0L
    var off = 8
    var done = false
    while (!done && off + 8 <= payload.length) {
      val len = be4at(off)
      val typ = new String(payload, off + 4, 4, StandardCharsets.US_ASCII)
      // the length field is untrusted input: a corrupt/hostile value
      // must not stall (len ≤ -12 → zero/negative progress) or overrun
      // the array — reject instead of looping
      require(len >= 0 && off + 12L + len <= payload.length,
        s"doc $docId: corrupt chunk $typ at $off (len=$len)")
      if (typ == "acTL") {
        // an acTL shorter than its 8-byte payload would read CRC/next-
        // chunk bytes as the frame count — reject malformed, don't misread
        require(len >= 8, s"doc $docId: acTL chunk too short (len=$len)")
        frames = be4at(off + 8)
      } else if (typ == "grAf") nBytes = len.toLong
      done = typ == "IEND" // trailing bytes after IEND are not chunks
      off += 12 + len // length + type + data + crc
    }
    MediaMeta(docId, nBytes, img.getWidth, img.getHeight, frames)
  }

  /** Thumbnail metadata from a REAL resize. `thumb_gray0` is the
    * RESAMPLED pixel at (0,0) — a value that only exists if the
    * downscale actually ran (the spec asserts it mixes source pixels;
    * the query drops it, since no oracle can recompute a codec's
    * resampling). */
  case class ThumbMeta(doc_id: Long, width: Int, height: Int,
    thumb_w: Int, thumb_h: Int, thumb_gray0: Int)

  /** Decode + genuine bilinear downscale to half dimensions (floor, min
    * 1) via Graphics2D — the resize stage of a media pipeline. Geometry
    * is oracle-checkable from the source-length formulas; the
    * resampled-pixel field is the proof-of-work the spec checks. */
  def decodeThumb(docId: Long, payload: Array[Byte]): ThumbMeta = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, s"doc $docId: ImageIO failed to decode payload")
    val (tw, th) = (math.max(1, img.getWidth / 2), math.max(1, img.getHeight / 2))
    val thumb = new java.awt.image.BufferedImage(
      tw, th, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val g = thumb.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, tw, th, null)
    } finally g.dispose()
    ThumbMeta(docId, img.getWidth, img.getHeight, tw, th,
      thumb.getRaster.getSample(0, 0, 0))
  }

  /** The shared encode stage: documents → (doc_id, PNG payload). */
  private def payloads(spark: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, encodePng(text.getBytes(StandardCharsets.UTF_8))) }
      .toDF("doc_id", "payload") // the opaque binary media column
      .as[(Long, Array[Byte])]
  }

  /** Resize stage over the corpus: text → PNG binary column →
    * partition-parallel decode + downscale → geometry table. Same scale
    * shape as [[mediaMeta]]; the resampled-pixel proof-of-work column
    * stays spec-side (not oracle-recomputable). */
  def mediaThumbs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    payloads(spark, dir)
      .mapPartitions(_.map { case (id, payload) => decodeThumb(id, payload) })
      .toDF()
      .drop("thumb_gray0")
  }

  /** Batch metadata extraction: text → real PNG binary column →
    * mapPartitions ImageIO decode → typed metadata table. Both codec
    * hops are partition-parallel with constant memory per task and no
    * driver involvement — at 100 TB the codec cost rides the existing
    * parquet partitioning. Null payloads are excluded up front (a NULL
    * media cell has nothing to decode; the oracle filters identically). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    payloads(spark, dir)
      .mapPartitions(_.map { case (id, payload) => decodePng(id, payload) })
      .toDF()
  }

  /** Every [[FrameStep]]-th frame is kept by [[frameSample]]. */
  val FrameStep = 2

  /** Frame-sampling stage — the video/animation analog of row sampling:
    * each media document's PARSED frame count (the real `acTL` chunk
    * walk behind [[mediaMeta]], parsed-not-derived per MultimodalSpec)
    * fans out to the sampled frame indices `0, step, 2·step, …` a
    * training loader would extract. The per-frame content hash is a
    * CLEARLY-DOCUMENTED deterministic stub (`md5("doc:idx")`): the
    * harness payloads are single-raster APNGs, so there is no per-frame
    * raster to decode — a real deployment swaps the stub for a frame
    * decode inside the same `explode` plumbing, which is the part that
    * has to scale (fan-out is map-side, no shuffle at all; the codec
    * cost rides the source partitioning like the other media ops). */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    mediaMeta(spark, dir)
      .select(col("doc_id"),
        // long-typed sequence (a cast AROUND explode won't plan)
        explode(expr("sequence(CAST(0 AS BIGINT), CAST(frames - 1 AS BIGINT), " +
          s"CAST($FrameStep AS BIGINT))")).as("frame_idx"))
      .withColumn("frame_fp", md5(concat(
        col("doc_id").cast("string"), lit(":"), col("frame_idx").cast("string"))))

  private def le2(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le4(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  /** A complete valid RIFF/WAVE file: PCM 16-bit little-endian with the
    * given format, sample j (frame-major, channel-minor) cycling
    * `(data[j mod n] − 128) · 256`. Exposed separately from
    * [[encodeWav]] so tests can build a WAV whose header CONTRADICTS
    * the length formulas (parsed-not-derived proof, like [[buildPng]]). */
  def buildWav(sampleRate: Int, channels: Int, frames: Int, data: Array[Byte]): Array[Byte] = {
    val n = data.length
    val cnt = frames * channels
    val pcm = new Array[Byte](cnt * 2)
    var j = 0
    while (j < cnt) {
      val s = if (n == 0) 0 else ((data(j % n) & 0xFF) - 128) * 256
      pcm(2 * j) = (s & 0xFF).toByte
      pcm(2 * j + 1) = ((s >> 8) & 0xFF).toByte
      j += 1
    }
    val blockAlign = channels * 2
    "RIFF".getBytes(StandardCharsets.US_ASCII) ++ le4(36 + pcm.length) ++
      "WAVE".getBytes(StandardCharsets.US_ASCII) ++
      "fmt ".getBytes(StandardCharsets.US_ASCII) ++ le4(16) ++
      le2(1) ++ le2(channels) ++ le4(sampleRate) ++
      le4(sampleRate * blockAlign) ++ le2(blockAlign) ++ le2(16) ++
      "data".getBytes(StandardCharsets.US_ASCII) ++ le4(pcm.length) ++ pcm
  }

  /** Deterministic audio format from the source length (mirrored by the
    * oracle SQL): n bytes → 8/12/16/20 kHz, 1 + n%2 channels,
    * 64 + n%192 frames. The ENCODER evaluates these; the decoder reads
    * the file. */
  def encodeWav(data: Array[Byte]): Array[Byte] = {
    val n = data.length
    buildWav(8000 + (n % 4) * 4000, 1 + n % 2, 64 + n % 192, data)
  }

  /** Decoded audio metadata + a decoded-sample feature (mean |amplitude|
    * over all samples, integer division — the loudness feature a filter
    * stage thresholds on). */
  case class AudioMeta(doc_id: Long, sample_rate: Int, channels: Int,
    n_frames: Long, duration_ms: Long, mean_abs: Long)

  /** Real codec decode: `javax.sound.sampled.AudioSystem` (the JDK's
    * RIFF/WAVE reader) parses the fmt header and frames the PCM stream;
    * the feature pass folds over the DECODED little-endian samples. */
  def decodeWav(docId: Long, payload: Array[Byte]): AudioMeta = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(payload))
    try {
      val fmt = in.getFormat
      val frames = in.getFrameLength
      val channels = fmt.getChannels
      val rate = fmt.getSampleRate.toInt
      require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
        s"doc $docId: unexpected PCM layout $fmt")
      val pcm = in.readAllBytes()
      require(pcm.length == frames * channels * 2,
        s"doc $docId: short PCM read (${pcm.length} bytes for $frames frames)")
      var sum = 0L
      var j = 0
      while (j < pcm.length) {
        val s = ((pcm(j) & 0xFF) | (pcm(j + 1) << 8)).toShort.toInt
        sum += math.abs(s)
        j += 2
      }
      val cnt = frames * channels
      AudioMeta(docId, rate, channels, frames,
        frames * 1000L / rate, if (cnt == 0) 0L else sum / cnt)
    } finally in.close()
  }

  /** Audio pipeline stage: text → real WAV binary column → partition-
    * parallel AudioSystem decode → typed metadata + loudness feature.
    * Identical scale shape to [[mediaMeta]] (constant memory per task,
    * no driver data path); the third modality next to PNG images. */
  def audioMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, encodeWav(text.getBytes(StandardCharsets.UTF_8))) }
      .toDF("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => decodeWav(id, payload) })
      .toDF()
  }

  /** Frames per analysis window for [[audioEnergy]] (a short-time
    * energy hop, the classic VAD frame). */
  val AudioWinFrames = 16
  /** Mean-|amplitude| threshold above which a window counts as active.
    * Chosen inside the corpus' sample range (ASCII text bytes map to
    * |s| ∈ [512, 24576]) so both verdicts genuinely occur. */
  val AudioVadThreshold = 12000L

  /** One short-time analysis window of a decoded audio stream. */
  case class AudioWindow(doc_id: Long, win_idx: Int, n_samples: Long,
    sum_sq: Long, mean_abs: Long, is_active: Boolean)

  /** Windowed short-time energy over the DECODED samples: the stream is
    * cut into [[AudioWinFrames]]-frame windows (last one ragged) and each
    * window reports its exact integer energy (Σs², Σ|s| div n) plus the
    * [[AudioVadThreshold]] activity verdict — the voice-activity shape a
    * speech pipeline uses to segment and filter silence before ASR. All
    * arithmetic is int64 (s ≤ 2¹⁵ so a window's Σs² ≤ 2³⁵), hence
    * hash-oracled like the rest of the audio path. */
  def decodeWavWindows(docId: Long, payload: Array[Byte]): Iterator[AudioWindow] = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(payload))
    try {
      val fmt = in.getFormat
      val frames = in.getFrameLength
      val channels = fmt.getChannels
      require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
        s"doc $docId: unexpected PCM layout $fmt")
      val pcm = in.readAllBytes()
      // sample indices below are Ints; a byte[] can't exceed
      // Int.MaxValue anyway, but make the bound explicit rather than
      // let s0.toInt silently wrap for a >2^31-sample stream
      require(frames * channels <= Int.MaxValue / 2,
        s"doc $docId: stream too long for in-memory window decode " +
          s"($frames frames x $channels ch)")
      require(pcm.length == frames * channels * 2,
        s"doc $docId: short PCM read (${pcm.length} bytes for $frames frames)")
      val nWins = ((frames + AudioWinFrames - 1) / AudioWinFrames).toInt
      (0 until nWins).iterator.map { w =>
        val s0 = w.toLong * AudioWinFrames * channels
        val s1 = math.min((w.toLong + 1) * AudioWinFrames, frames) * channels
        var sumAbs = 0L
        var sumSq = 0L
        var j = s0.toInt
        while (j < s1) {
          val s = ((pcm(2 * j) & 0xFF) | (pcm(2 * j + 1) << 8)).toShort.toInt
          sumAbs += math.abs(s)
          sumSq += s.toLong * s
          j += 1
        }
        val n = s1 - s0
        val meanAbs = if (n == 0) 0L else sumAbs / n
        AudioWindow(docId, w, n, sumSq, meanAbs, meanAbs >= AudioVadThreshold)
      }
    } finally in.close()
  }

  /** Audio feature extraction: encode → partition-parallel codec decode →
    * one row per analysis window ([[decodeWavWindows]]). Completes the
    * multimodal quartet (metadata, feature-extract, resize, frame-sample)
    * for the audio modality; same constant-memory, no-driver-path shape
    * as [[audioMeta]]. */
  def audioEnergy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, encodeWav(text.getBytes(StandardCharsets.UTF_8))) }
      .toDF("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) => decodeWavWindows(id, payload) })
      .toDF()
  }

  /** Perceptual-hash banding parameters: 64-bit aHash split into 8
    * 8-bit bands — by pigeonhole, any pair within [[PhashMaxHamming]]
    * (< 8) Hamming distance agrees on at least one band, so the banded
    * candidate stage finds EVERY qualifying pair (Manku's trick, the
    * [[graft.ops.DedupOps.simhashNearDup]] shape reapplied to images). */
  val PhashBands = 8
  val PhashMaxHamming = 7

  /** 8×8 average-hash (aHash) of a DECODED image: 64 nearest-neighbor
    * grid samples of the grayscale raster (sample (y,x) reads pixel
    * (y·h/8, x·w/8), integer division), bit i set iff sample i ≥ the
    * integer mean. Runs on the codec's raster, not the source bytes —
    * the pixel values happen to be a deterministic function of the
    * source, which is what lets the oracle recompute the hash in SQL. */
  def aHash64(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    val r = img.getRaster
    val s = new Array[Int](64)
    var sum = 0L
    var i = 0
    while (i < 64) {
      s(i) = r.getSample((i % 8) * w / 8, (i / 8) * h / 8, 0)
      sum += s(i)
      i += 1
    }
    val mean = sum / 64
    var hash = 0L
    i = 0
    while (i < 64) { if (s(i) >= mean) hash |= 1L << i; i += 1 }
    hash
  }

  /** Image near-duplicate pairs by perceptual hash — multimodal joined
    * into the dedup story: encode → partition-parallel ImageIO decode →
    * [[aHash64]] over the raster → Hamming-banded self-join. Candidates
    * only form inside a shared (band, bits) bucket (8 shuffle rows per
    * image, never all-pairs); a pair colliding in several bands is kept
    * only at its FIRST matching band (the band array rides along — no
    * distinct shuffle); survivors verify bit_count(xor) ≤
    * [[PhashMaxHamming]]. Exact for the threshold by pigeonhole, so the
    * oracle is the plain all-pairs Hamming filter. */
  def phashNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the banded self-join below reads this frame on BOTH sides, whose
    // map stages run concurrently — without a materialization each side
    // re-runs the ImageIO decode + aHash64 over every image (by far the
    // heaviest per-row work here). materializeOnce the two-longs-per-
    // image projection (unpersist-stale + persist + eager count): one
    // decode pass per invocation.
    val hashed = graft.ingest.Materialize.materializeOnce("phashNearDup.hashes",
      payloads(spark, dir)
      .mapPartitions(_.map { case (id, payload) =>
        val img = ImageIO.read(new ByteArrayInputStream(payload))
        require(img != null, s"doc $id: ImageIO failed to decode payload")
        (id, aHash64(img))
      })
      .toDF("doc_id", "phash"))
    val bandBits = array((0 until PhashBands).map(b =>
      shiftright(col("phash"), b * 8).bitwiseAND(lit(255L))): _*)
    val k = hashed.withColumn("bb", bandBits)
      .select(col("doc_id"), col("phash"),
        posexplode(col("bb")).as(Seq("band", "bits")), col("bb"))
    val a = k.select(col("band"), col("bits"), col("doc_id").as("doc_a"),
      col("phash").as("ha"), col("bb").as("bb_a"))
    val b = k.select(col("band"), col("bits"), col("doc_id").as("doc_b"),
      col("phash").as("hb"), col("bb").as("bb_b"))
    // first band whose bits agree (element_at is 1-based)
    val firstMatch = (0 until PhashBands - 1)
      .foldRight(lit(PhashBands - 1): Column) { (t, rest) =>
        when(element_at(col("bb_a"), t + 1) === element_at(col("bb_b"), t + 1),
          lit(t)).otherwise(rest)
      }
    a.join(b, Seq("band", "bits"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(firstMatch === col("band"))
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int"))
      .filter(col("hamming") <= PhashMaxHamming)
      .select("doc_a", "doc_b", "hamming")
  }
}
