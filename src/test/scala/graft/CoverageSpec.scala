package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** COVERAGE.md is the judge-facing inventory mapping every
  * `SparkEntry.queries` entry to its operator row. It drifted twice
  * (rounds 5 and 7 added queries without rows), so the mapping is now
  * mechanically pinned: a query key missing from the document fails CI.
  * (The reverse direction — a documented q_* name with no query — is
  * pinned too, so stale rows can't survive a rename.) */
class CoverageSpec extends AnyFunSuite {
  private lazy val coverage: String = new String(
    Files.readAllBytes(Paths.get("COVERAGE.md")), StandardCharsets.UTF_8)

  test("every SparkEntry.queries key appears in COVERAGE.md") {
    val missing = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(coverage.contains)
    assert(missing.isEmpty,
      s"queries with no COVERAGE.md row: ${missing.mkString(", ")}")
  }

  test("every q_* name mentioned in COVERAGE.md is a live query") {
    val mentioned = "q_[a-z0-9_]+".r.findAllIn(coverage).toSet
    val stale = (mentioned -- SparkEntry.queries.keySet).toSeq.sorted
    assert(stale.isEmpty,
      s"COVERAGE.md names queries that do not exist: ${stale.mkString(", ")}")
  }

  test("the header's query count equals the live query count") {
    val header = "— (\\d+) as of round".r.findFirstMatchIn(coverage)
      .map(_.group(1).toInt)
    assert(header.contains(SparkEntry.queries.size),
      s"COVERAGE.md header says ${header.orNull}, " +
        s"SparkEntry.queries has ${SparkEntry.queries.size}")
  }

  test("the current round has a ledger (judge r12 #4: LakeLadder's " +
    "round-12 results were promised to a ledger that did not exist)") {
    val round = "as of round (\\d+)".r.findFirstMatchIn(coverage)
      .map(_.group(1).toInt)
    assert(round.nonEmpty, "header names no round")
    assert(coverage.contains(s"## Round ${round.get} ledger"),
      s"COVERAGE.md has no '## Round ${round.get} ledger' section")
  }

  test("every query has oracle SQL (the round-4 'none rows-only' claim)") {
    val unoracled = (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet)
      .toSeq.sorted
    assert(unoracled.isEmpty,
      s"queries without an oracle: ${unoracled.mkString(", ")}")
    val orphaned = (SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet)
      .toSeq.sorted
    assert(orphaned.isEmpty,
      s"oracles without a query: ${orphaned.mkString(", ")}")
  }
}
