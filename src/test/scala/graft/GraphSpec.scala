package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GraphOps

/** Triangle-count semantics on a hand-built co-purchase graph. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("triangleCount: one triangle + a pendant edge, duplicates collapse") {
    val d = Files.createTempDirectory("graft_graph").toString
    // order 10 buys {1,2,3} → triangle; order 11 buys {3,4} → pendant
    // edge; order 12 re-buys {1,2} → duplicate edge must not double-count;
    // part 5 is non-PROMO, so order 13's {4,5} contributes nothing new
    Seq((10L, 1L), (10L, 2L), (10L, 3L), (11L, 3L), (11L, 4L),
      (12L, 1L), (12L, 2L), (13L, 4L), (13L, 5L))
      .toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$d/lineitem.parquet")
    Seq((1L, "PROMO"), (2L, "PROMO"), (3L, "PROMO"), (4L, "PROMO"),
      (5L, "STANDARD"))
      .toDF("p_partkey", "p_type")
      .write.parquet(s"$d/part.parquet")
    val r = GraphOps.triangleCount(spark, d).collect()(0)
    assert(r.getLong(0) == 4L) // nodes 1..4
    assert(r.getLong(1) == 4L) // 1-2, 1-3, 2-3, 3-4
    assert(r.getLong(2) == 1L) // the single 1-2-3 triangle

    // pageRank on the same graph: the hub (3, degree 3) outranks all;
    // the structurally symmetric nodes 1 and 2 get IDENTICAL integer
    // ranks; every rank carries at least the damping floor
    val pr = GraphOps.pageRank(spark, d).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(pr.size == 4)
    assert(pr(3L) == pr.values.max)
    assert(pr(1L) == pr(2L))
    assert(pr.values.forall(_ >= 15L * GraphOps.PrScale / 100))
  }

  test("bfsHops: known hop counts on a path + unreachable component") {
    val d = Files.createTempDirectory("graft_bfs").toString
    // path 1-2, 2-3, 3-4 (source = min vertex 1 → hops 0,1,2,3) plus a
    // DISCONNECTED promo pair {8,9} that must never appear
    Seq((10L, 1L), (10L, 2L), (11L, 2L), (11L, 3L), (12L, 3L), (12L, 4L),
      (13L, 8L), (13L, 9L))
      .toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$d/lineitem.parquet")
    Seq(1L, 2L, 3L, 4L, 8L, 9L).map(p => (p, "PROMO"))
      .toDF("p_partkey", "p_type")
      .write.parquet(s"$d/part.parquet")
    val hops = GraphOps.bfsHops(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hops == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }
}
