package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing (north-star: image/audio/video payloads in
  * a training-data pipeline). Media travels as an opaque `binary` column
  * with typed metadata extracted by a per-partition batch decoder —
  * the Spark-side shape (schema, partitioning, typed Dataset in/out,
  * batched per-partition processing) is real; the codec itself is a
  * deterministic STUB because this container ships no image/audio
  * libraries. Swap [[MultimodalOps.decodeStub]] for a real decoder and
  * nothing else changes.
  */
object MultimodalOps {

  /** Decoded media metadata (fake dimensions derived from the payload —
    * deterministic, so the pipeline stays oracle-checkable). */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int, frames: Int)

  /** STUB decoder: a real implementation would parse the container
    * header (e.g. PNG IHDR / WAV fmt). The fake is pure arithmetic on
    * the byte length so the oracle can reproduce it. */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(
      doc_id = docId,
      n_bytes = n,
      width = (1 + n % 64).toInt,
      height = (1 + (n / 64) % 64).toInt,
      frames = (1 + n % 8).toInt)
  }

  /** Batch metadata extraction: text → binary payload column →
    * mapPartitions decode → typed metadata table. Partition-parallel,
    * constant memory per task, no driver involvement — at 100 TB the
    * decode cost rides the existing parquet partitioning. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => decodeStub(id, payload) })
      .toDF()
  }
}
