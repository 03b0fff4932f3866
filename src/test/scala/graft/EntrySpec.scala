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
}
