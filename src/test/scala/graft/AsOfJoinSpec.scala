package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventOps
import graft.plans.AsOfJoinOp

/** The custom as-of physical operator (AsOfJoin → AsOfJoinStrategy →
  * AsOfMergeJoinExec): edge semantics on a hand-built fixture, result
  * equivalence with the relational union+window form on real testdata,
  * and the plan shape (custom exec present; no window, no union). */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("merge semantics: inclusive tie, latest-≤ pick, unmatched NULL, " +
    "null keys/times never match, keys interleave across partitions") {
    val probe = Seq(
      (1L, Option(ts(100)), 10L),          // exact tie with a right row
      (1L, Option(ts(150)), 11L),          // between right rows → 100
      (1L, Option(ts(50)), 12L),           // before any right row → NULL
      (2L, Option(ts(500)), 20L),          // other key, after both → 400
      (3L, Option(ts(100)), 30L),          // key with no right rows → NULL
      (4L, None: Option[Timestamp], 40L),  // null probe time → NULL
      (0L, Option(ts(100)), 50L)           // key 0: only null-time right rows
    ).toDF("k", "t", "id")
    val build = Seq(
      (Option(1L), Option(ts(100))),
      (Option(1L), Option(ts(200))),
      (Option(2L), Option(ts(300))),
      (Option(2L), Option(ts(400))),
      (Option(0L), None: Option[Timestamp]), // null build time: discarded
      (None: Option[Long], Option(ts(100)))  // null build key: discarded
    ).toDF("rk", "rt")
    val out = AsOfJoinOp(probe, "k", "t", build, "rk", "rt")
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[Timestamp]("asof_t")).map(_.getTime / 1000L)).toMap
    assert(out == Map(
      10L -> Some(100L), 11L -> Some(100L), 12L -> None,
      20L -> Some(400L), 30L -> None, 40L -> None, 50L -> None))
  }

  test("custom exec ≡ the relational union+window form on testdata") {
    val exec = EventOps.asofLastOrderExec(spark, TestSpark.Sf0001)
    val rel = EventOps.asofLastOrder(spark, TestSpark.Sf0001)
    assert(exec.count() > 0)
    assert(exec.exceptAll(rel).isEmpty && rel.exceptAll(exec).isEmpty,
      "custom AsOfMergeJoinExec diverged from the union+window form")
  }

  test("plan: AsOfMergeJoinExec with one exchange per side — no window, " +
    "no union, no sort-merge join") {
    val df = EventOps.asofLastOrderExec(spark, TestSpark.Sf0001)
    df.collect()
    // AQE prints Final + Initial sections: audit the final one only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("AsOfMergeJoin"), plan)
    assert(!plan.contains("Window"), s"emulation leaked back in:\n$plan")
    assert(!plan.contains("Union"), s"emulation leaked back in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
    val exchanges = "ENSURE_REQUIREMENTS".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$plan")
  }

  test("q_asof_sql: the ASOF JOIN syntax plans the SAME AsOfMergeJoinExec " +
    "as the DataFrame path and agrees row-for-row") {
    val sql = EventOps.asofLastOrderSql(spark, TestSpark.Sf0001)
    sql.collect()
    val plan = sql.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("AsOfMergeJoin"), s"SQL path missed the exec:\n$plan")
    assert(!plan.contains("graft_asof_marker"), s"marker leaked:\n$plan")
    val exec = EventOps.asofLastOrderExec(spark, TestSpark.Sf0001)
    assert(sql.exceptAll(exec).isEmpty && exec.exceptAll(sql).isEmpty,
      "SQL front end diverged from the DataFrame front end")
  }

  test("ASOF JOIN syntax: swapped key equality normalizes; reversed time " +
    "inequality (a forward as-of) is rejected, not silently flipped") {
    import org.apache.spark.sql.functions.col
    import graft.sources.Tables
    Tables.events(spark, TestSpark.Sf0001).filter(col("ts").isNotNull)
      .select(col("user_id"), col("ts").cast("timestamp").as("t"),
        col("event_id"))
      .createOrReplaceTempView("graft_asof_ev")
    Tables.orders(spark, TestSpark.Sf0001)
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp").as("ot"))
      .createOrReplaceTempView("graft_asof_ord")
    // key equality written right-side-first: equality is symmetric, the
    // strategy normalizes, and the result matches the canonical order
    val swapped = spark.sql(
      """SELECT event_id, unix_micros(asof_t) AS a FROM graft_asof_ev
        |ASOF JOIN graft_asof_ord
        |  ON graft_asof_ord.o_custkey = graft_asof_ev.user_id
        |  AND graft_asof_ev.t >= graft_asof_ord.ot""".stripMargin)
    val canonical = spark.sql(
      """SELECT event_id, unix_micros(asof_t) AS a FROM graft_asof_ev
        |ASOF JOIN graft_asof_ord
        |  ON graft_asof_ev.user_id = graft_asof_ord.o_custkey
        |  AND graft_asof_ev.t >= graft_asof_ord.ot""".stripMargin)
    assert(swapped.exceptAll(canonical).isEmpty &&
      canonical.exceptAll(swapped).isEmpty)
    // reversed inequality = forward as-of: hard error at plan time
    val e = intercept[Exception] {
      spark.sql(
        """SELECT event_id FROM graft_asof_ev ASOF JOIN graft_asof_ord
          |  ON graft_asof_ev.user_id = graft_asof_ord.o_custkey
          |  AND graft_asof_ord.ot >= graft_asof_ev.t""".stripMargin).collect()
    }
    assert(e.getMessage.contains("backward ASOF") ||
      Option(e.getCause).exists(_.getMessage.contains("backward ASOF")),
      s"wrong failure: $e")
  }
}
