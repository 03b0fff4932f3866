package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MultimodalOps

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("decodeStub is deterministic arithmetic on the payload length") {
    val m = MultimodalOps.decodeStub(7L, Array.fill(130)(0x41.toByte))
    assert(m == MultimodalOps.MediaMeta(7L, 130L, 1 + 130 % 64, 1 + (130 / 64) % 64, 1 + 130 % 8))
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
