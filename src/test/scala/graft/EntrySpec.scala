package graft

/** Driver-contract guards: the oracle map must cover every query (the
  * driver records only a weak rows-only check otherwise), and the
  * flagship entry must return rows. */
class EntrySpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Queries intentionally without oracle SQL (engine-specific output).
    * Both carry spec-asserted error bounds below instead. */
  val RowsOnly = Set("q_approx_distinct", "q_approx_percentile")

  test("every query has oracle SQL unless documented rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- RowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracle for unknown query: $orphaned")
  }

  test("flagship entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_approx_percentile: sketch rank error within n/accuracy per group") {
    // GK summaries guarantee rank error <= n/accuracy; the sketch returns
    // an actual data value, so its rank interval [#(< v)+1, #(<= v)] must
    // overlap [n/2 - n/acc, n/2 + n/acc] (+1 for the discrete midpoint)
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("q_approx_percentile")(spark, TestSpark.Sf0001)
    val cents = graft.sources.Tables.events(spark, TestSpark.Sf0001)
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select(col("event_type").as("et"), graft.functions.Exact.cents(col("value")).as("c"))
    val rows = approx.join(cents, col("event_type") === col("et"))
      .groupBy("event_type", "approx_p50_cents", "n")
      .agg(sum(when(col("c") < col("approx_p50_cents"), 1L).otherwise(0L)).as("lo"),
        sum(when(col("c") <= col("approx_p50_cents"), 1L).otherwise(0L)).as("hi"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, lo, hi) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val tol = n.toDouble / graft.ops.EventOps.PctAccuracy + 1
      assert(lo <= n / 2.0 + tol && hi >= n / 2.0 - tol,
        s"${r.getString(0)}: rank interval [${lo + 1},$hi] misses n/2=${n / 2.0}±$tol")
    }
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
