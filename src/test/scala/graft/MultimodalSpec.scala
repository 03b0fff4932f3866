package graft

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MultimodalOps

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** A VALID PNG whose geometry fields CONTRADICT the length formulas —
    * if the decoder derived dimensions from the payload length instead
    * of decoding the file, these assertions would fail. */
  test("decodePng decodes the file, not length arithmetic") {
    val data = Array.fill(130)(0x41.toByte)
    // 130 % 64 + 1 = 3 ≠ 123; (130/64) % 64 + 1 = 3 ≠ 45; 130 % 8 + 1 = 3 ≠ 6
    val payload = MultimodalOps.buildPng(123, 45, 6, data)
    val m = MultimodalOps.decodePng(7L, payload)
    assert(m == MultimodalOps.MediaMeta(7L, 130L, 123, 45, 6))
  }

  test("the payload is a genuine PNG: ImageIO dims equal the IHDR fields") {
    val payload = MultimodalOps.encodePng("some document text".getBytes("UTF-8"))
    // independent decode by the JDK codec (zlib inflate + CRC checks)
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    assert(img != null, "ImageIO rejected the encoded PNG")
    // header parse straight off the bytes: IHDR data starts at offset 16
    def be4(off: Int): Int =
      ((payload(off) & 0xFF) << 24) | ((payload(off + 1) & 0xFF) << 16) |
        ((payload(off + 2) & 0xFF) << 8) | (payload(off + 3) & 0xFF)
    assert(img.getWidth == be4(16) && img.getHeight == be4(20))
    // and the pixels round-trip: pixel (0,0) is the first source byte
    assert((img.getRaster.getSample(0, 0, 0) & 0xFF) == 's'.toInt)
  }

  test("decodePng rejects a payload without the PNG magic") {
    intercept[IllegalArgumentException] {
      MultimodalOps.decodePng(1L, Array.fill(64)(0x00.toByte))
    }
  }

  test("decodePng rejects a magic-only payload ImageIO cannot decode") {
    val truncated = MultimodalOps.encodePng("abc".getBytes("UTF-8")).take(20)
    intercept[Exception] {
      MultimodalOps.decodePng(2L, truncated)
    }
  }

  test("encodePng → decodePng round-trips the oracle formulas") {
    for (n <- Seq(0, 11, 63, 64, 200, 4096)) {
      val data = Array.tabulate(n)(i => (i % 251).toByte)
      val m = MultimodalOps.decodePng(n.toLong, MultimodalOps.encodePng(data))
      assert(m == MultimodalOps.MediaMeta(n.toLong, n.toLong,
        1 + n % 64, 1 + (n / 64) % 64, 1 + n % 8), s"n=$n")
    }
  }

  test("decodeThumb really resamples: a 2x1 black/white image averages to gray") {
    // buildPng pixels cycle the data bytes: data = [0x00, 0xFF] over a
    // 2×1 grayscale image → the SHIPPED decoder's 1×1 bilinear thumb
    // must mix both pixels; a fake deriving geometry from arithmetic
    // never touches pixel memory (thumb_gray0 wouldn't exist), and a
    // nearest-neighbor copy would give 0 or 255
    val png = MultimodalOps.buildPng(2, 1, 1, Array(0x00.toByte, 0xFF.toByte))
    val m = MultimodalOps.decodeThumb(1L, png)
    assert((m.doc_id, m.width, m.height, m.thumb_w, m.thumb_h) == ((1L, 2, 1, 1, 1)))
    assert(m.thumb_gray0 > 32 && m.thumb_gray0 < 224,
      s"no resampling happened: ${m.thumb_gray0}")
  }

  test("aHash64 reads the decoded raster: uniform image → all bits, bright half → split bits") {
    // uniform pixels: every sample == mean → every bit set → hash -1
    val flat = ImageIO.read(new ByteArrayInputStream(
      MultimodalOps.buildPng(16, 16, 1, Array(0x40.toByte))))
    assert(MultimodalOps.aHash64(flat) == -1L)
    // bottom half bright: exactly grid rows 4..7 (bits 32..63) set —
    // a hash only a real pixel read can produce
    val data = Array.tabulate(16 * 16)(i => if (i < 8 * 16) 0x00.toByte else 0xFF.toByte)
    val split = ImageIO.read(new ByteArrayInputStream(
      MultimodalOps.buildPng(16, 16, 1, data)))
    assert(MultimodalOps.aHash64(split) == 0xFFFFFFFF00000000L)
  }

  test("phashNearDup: unique pairs, hamming bounded, ordered ids") {
    val rows = MultimodalOps.phashNearDup(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty)
    assert(rows.map(p => (p._1, p._2)).distinct.length == rows.length,
      "a pair surfaced from more than one band")
    assert(rows.forall(p => p._3 <= MultimodalOps.PhashMaxHamming && p._1 < p._2))
  }

  test("mediaMeta decodes per-partition and matches document byte lengths") {
    val out = MultimodalOps.mediaMeta(spark, TestSpark.Sf0001)
    val mismatch = out.join(
        graft.sources.Tables.documents(spark, TestSpark.Sf0001), "doc_id")
      .filter(org.apache.spark.sql.functions.expr("n_bytes != octet_length(text)"))
      .count()
    assert(mismatch == 0)
    assert(out.count() == 500)
  }

  test("frameSample: every FrameStep-th frame of the PARSED count, nothing else") {
    import org.apache.spark.sql.functions.col
    val meta = MultimodalOps.mediaMeta(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("frames")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val sampled = MultimodalOps.frameSample(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = sampled.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byDoc.keySet == meta.keySet)
    byDoc.foreach { case (id, idxs) =>
      assert(idxs == (0L until meta(id).toLong by MultimodalOps.FrameStep.toLong).toSeq,
        s"doc $id: sampled $idxs from ${meta(id)} frames")
    }
  }

  /** A VALID WAV whose header CONTRADICTS the length formulas — if the
    * decoder derived the format from the payload length instead of
    * parsing the RIFF header, these assertions would fail. */
  test("decodeWav decodes the file, not length arithmetic") {
    val data = "abcd".getBytes("UTF-8") // n=4 → formulas say 8000 Hz, 1 ch, 68 frames
    val payload = MultimodalOps.buildWav(11025, 2, 10, data)
    val m = MultimodalOps.decodeWav(3L, payload)
    assert(m.sample_rate == 11025 && m.channels == 2 && m.n_frames == 10L)
    assert(m.duration_ms == 10L * 1000L / 11025L)
    // 20 samples cycling (ord - 128)*256 over "abcd": |s| = (128-ord)*256
    val abs = data.map(b => (128 - b).toLong * 256)
    val expected = (0 until 20).map(j => abs(j % 4)).sum / 20
    assert(m.mean_abs == expected)
  }

  test("the payload is a genuine WAV: AudioSystem parses format and frames") {
    val payload = MultimodalOps.encodeWav("some document text".getBytes("UTF-8")) // n=18
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(payload))
    try {
      assert(in.getFormat.getSampleRate.toInt == 8000 + (18 % 4) * 4000)
      assert(in.getFormat.getChannels == 1 + 18 % 2)
      assert(in.getFrameLength == 64 + 18 % 192)
    } finally in.close()
  }

  test("decodeWavWindows: ragged tail window, exact integer energy, " +
    "VAD verdict on both sides of the threshold") {
    // 20-frame mono stream → window 0 = frames 0-15 (full),
    // window 1 = frames 16-19 (ragged, 4 samples)
    val loud = Array.fill(4)(' '.toByte) // |s| = 96*256 = 24576 ≥ threshold
    val win = MultimodalOps.decodeWavWindows(7L,
      MultimodalOps.buildWav(8000, 1, 20, loud)).toSeq
    assert(win.map(w => (w.win_idx, w.n_samples)) == Seq((0, 16L), (1, 4L)))
    val s = 24576L
    assert(win(0).sum_sq == 16 * s * s && win(1).sum_sq == 4 * s * s)
    assert(win.forall(w => w.mean_abs == s && w.is_active))
    // quiet content: '~' (126) → |s| = 2*256 = 512 < threshold
    val quiet = MultimodalOps.decodeWavWindows(8L,
      MultimodalOps.buildWav(8000, 1, 16, Array('~'.toByte))).toSeq
    assert(quiet.map(_.is_active) == Seq(false) && quiet.head.mean_abs == 512L)
  }

  test("audioEnergy: window count and sample accounting match the " +
    "decoded geometry corpus-wide") {
    import org.apache.spark.sql.functions.{col, sum => fsum, countDistinct}
    val out = MultimodalOps.audioEnergy(spark, TestSpark.Sf0001)
    val perDoc = out.groupBy("doc_id")
      .agg(fsum("n_samples").as("samples"), countDistinct("win_idx").as("wins"))
      .join(graft.sources.Tables.documents(spark, TestSpark.Sf0001), "doc_id")
    // every doc's windows account for exactly frames × channels samples
    val bad = perDoc.filter(org.apache.spark.sql.functions.expr(
      "samples != CAST(64 + octet_length(text) % 192 AS BIGINT) * (1 + octet_length(text) % 2)" +
        " OR wins != CAST((64 + octet_length(text) % 192 + 15) DIV 16 AS BIGINT)")).count()
    assert(bad == 0)
    // the threshold genuinely splits the corpus
    val verdicts = out.select("is_active").distinct().count()
    assert(verdicts == 2)
  }

  test("audioMeta runs over the corpus with the formula geometry") {
    val out = MultimodalOps.audioMeta(spark, TestSpark.Sf0001)
    val bad = out.join(
        graft.sources.Tables.documents(spark, TestSpark.Sf0001), "doc_id")
      .filter(org.apache.spark.sql.functions.expr(
        "sample_rate != 8000 + (octet_length(text) % 4) * 4000" +
          " OR n_frames != 64 + octet_length(text) % 192"))
      .count()
    assert(bad == 0)
    assert(out.count() == 500)
  }
}
