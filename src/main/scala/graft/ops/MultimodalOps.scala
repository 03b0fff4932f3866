package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing (north-star: image/audio/video payloads in
  * a training-data pipeline). Media travels as an opaque `binary` column
  * with typed metadata extracted by a per-partition batch decoder.
  *
  * The container ships no image/audio libraries, so the payloads are
  * SYNTHETIC — but they are real bytes in a real layout (PNG magic +
  * IHDR + APNG acTL chunks), built with codegen'd binary Column algebra,
  * and the decoder genuinely PARSES big-endian fields back out of the
  * header (MultimodalSpec proves parsed-not-derived with a payload whose
  * header contradicts its length). Swap [[decodePng]] for a real codec
  * call and nothing else changes: the Spark-side shape — binary column,
  * typed Dataset in/out, partition-parallel batch decode, constant
  * memory per task — is the deliverable.
  */
object MultimodalOps {

  /** Decoded media metadata. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int, frames: Int)

  /** Bytes before the media data: PNG magic (8) + IHDR chunk (4 len +
    * 4 type + 13 data) + acTL chunk (4 len + 4 type + 8 data). */
  val HeaderLen = 45

  /** Synthetic APNG-shaped container, all in codegen'd Column algebra:
    *
    * {{{
    * offset  0  PNG magic 89 50 4E 47 0D 0A 1A 0A
    *         8  IHDR length (13) | 12 "IHDR"
    *        16  width  (4, big-endian)  = 1 + n % 64
    *        20  height (4, big-endian)  = 1 + (n/64) % 64
    *        24  bit depth 8 | color type 6 | compression 0 | filter 0 | interlace 0
    *        29  acTL length (8) | 33 "acTL"
    *        37  num_frames (4, big-endian) = 1 + n % 8
    *        41  num_plays  (4, big-endian) = 0
    *        45  media data (the UTF-8 text bytes; n = their length)
    * }}}
    *
    * The dimension FORMULAS mirror the oracle SQL; the decoder never
    * evaluates them — it reads the bytes. */
  def encodePayload(text: Column): Column = {
    val data = text.cast("binary")
    val n = length(data).cast("long")
    def be4(c: Column): Column = unhex(lpad(hex(c), 8, "0"))
    concat(
      unhex(lit("89504E470D0A1A0A")),
      be4(lit(13L)), lit("IHDR").cast("binary"),
      be4(lit(1L) + pmod(n, lit(64L))),
      be4(lit(1L) + pmod(floor(n / 64).cast("long"), lit(64L))),
      unhex(lit("0806000000")),
      be4(lit(8L)), lit("acTL").cast("binary"),
      be4(lit(1L) + pmod(n, lit(8L))),
      be4(lit(0L)),
      data)
  }

  /** Header parser standing in for a real codec: checks the magic and
    * reads the big-endian dimension fields at their chunk offsets. */
  def decodePng(docId: Long, payload: Array[Byte]): MediaMeta = {
    require(payload.length >= HeaderLen &&
      (payload(0) & 0xFF) == 0x89 && payload(1) == 'P' &&
      payload(2) == 'N' && payload(3) == 'G',
      s"doc $docId: not a graft-PNG payload")
    def be4(off: Int): Int =
      ((payload(off) & 0xFF) << 24) | ((payload(off + 1) & 0xFF) << 16) |
        ((payload(off + 2) & 0xFF) << 8) | (payload(off + 3) & 0xFF)
    MediaMeta(
      doc_id = docId,
      n_bytes = (payload.length - HeaderLen).toLong,
      width = be4(16),
      height = be4(20),
      frames = be4(37))
  }

  /** Batch metadata extraction: text → APNG-shaped binary payload →
    * mapPartitions header parse → typed metadata table. The encode stays
    * inside WholeStageCodegen; the decode is partition-parallel with
    * constant memory per task and no driver involvement — at 100 TB the
    * codec cost rides the existing parquet partitioning. Null payloads
    * are excluded up front (a NULL media cell has nothing to decode; the
    * oracle filters identically). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), encodePayload(col("text")).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => decodePng(id, payload) })
      .toDF()
  }
}
