package graft

/** Driver-contract guards: the oracle map must cover every query (the
  * driver records only a weak rows-only check otherwise), and the
  * flagship entry must return rows. */
class EntrySpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Queries intentionally without oracle SQL (engine-specific output). */
  val RowsOnly = Set("q_approx_distinct")

  test("every query has oracle SQL unless documented rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- RowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracle for unknown query: $orphaned")
  }

  test("flagship entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_approx_distinct: HLL estimate within 3×rsd of the exact count per group") {
    // The rows-only status above means a wildly wrong sketch would pass
    // the driver silently — so the error bound is pinned here instead.
    // approx_count_distinct's default rsd is 0.05; HLL++'s relative
    // error is approximately normal around the true count, so 3σ covers
    // ~99.7% of sketches; the query emits the exact count alongside.
    val rows = SparkEntry.queries("q_approx_distinct")(spark, TestSpark.Sf0001)
      .select("event_type", "approx_users", "exact_users").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      assert(exact > 0, s"${r.getString(0)}: exact count is 0")
      val relErr = math.abs(approx - exact).toDouble / exact
      assert(relErr <= 3 * 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact relErr=$relErr > 0.15")
    }
  }
}
