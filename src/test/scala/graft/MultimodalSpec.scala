package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MultimodalOps

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** A well-formed header whose dimension fields CONTRADICT the formulas
    * on the payload length — if the decoder derived instead of parsed,
    * these assertions would fail. */
  test("decodePng parses header fields, not length arithmetic") {
    def be4(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    val magic = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val payload = magic ++
      be4(13) ++ "IHDR".getBytes ++ be4(123) ++ be4(45) ++
      Array[Byte](8, 6, 0, 0, 0) ++
      be4(8) ++ "acTL".getBytes ++ be4(6) ++ be4(0) ++
      Array.fill(130)(0x41.toByte)
    val m = MultimodalOps.decodePng(7L, payload)
    // 130 % 64 + 1 = 3 ≠ 123; (130/64) % 64 + 1 = 3 ≠ 45; 130 % 8 + 1 = 3 ≠ 6
    assert(m == MultimodalOps.MediaMeta(7L, 130L, 123, 45, 6))
  }

  test("decodePng rejects a payload without the PNG magic") {
    intercept[IllegalArgumentException] {
      MultimodalOps.decodePng(1L, Array.fill(64)(0x00.toByte))
    }
  }

  test("encodePayload → decodePng round-trips the oracle formulas") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "hello world"), (2L, "x" * 200)).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), MultimodalOps.encodePayload(col("text")).as("p"))
      .as[(Long, Array[Byte])]
      .collect()
      .map { case (id, p) => MultimodalOps.decodePng(id, p) }
      .map(m => m.doc_id -> m).toMap
    assert(out(1L) == MultimodalOps.MediaMeta(1L, 11L, 1 + 11 % 64, 1 + (11 / 64) % 64, 1 + 11 % 8))
    assert(out(2L) == MultimodalOps.MediaMeta(2L, 200L, 1 + 200 % 64, 1 + (200 / 64) % 64, 1 + 200 % 8))
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
}
