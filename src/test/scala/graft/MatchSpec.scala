package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{MatchOps, Relational}

/** Fuzzy entity matching + SCD2 history semantics on synthetic tables. */
class MatchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fuzzyMatch resolves each corrupted name to its source catalog entry") {
    val d = Files.createTempDirectory("graft_match").toString
    Seq((1L, "small ring"), (2L, "small rope"), (3L, "blue bolt"))
      .toDF("p_partkey", "p_name")
      .write.parquet(s"$d/part.parquet")
    val out = MatchOps.fuzzyMatch(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getInt(3))).toMap
    // key 1 drops char 3: "smll ring" → nearest is its own source, dist 1
    assert(out(1L) == (("smll ring", "small ring", 1)))
    // key 2 drops char 4: "smal rope" → "small rope" (dist 1) beats "small ring" (3)
    assert(out(2L) == (("smal rope", "small rope", 1)))
    // key 3 drops char 5 (the space): sole 'b'-block candidate is its source
    assert(out(3L) == (("bluebolt", "blue bolt", 1)))
  }

  test("scd2 chains valid_from/valid_to per entity and flags the current row") {
    val d = Files.createTempDirectory("graft_scd").toString
    def ts(s: String) = Timestamp.valueOf(s)
    Seq(
      (7L, 100L, "1-URGENT", ts("2024-01-01 00:00:00")),
      (7L, 101L, "3-MEDIUM", ts("2024-02-01 00:00:00")),
      (7L, 102L, "5-LOW", ts("2024-03-01 00:00:00")),
      (8L, 200L, "2-HIGH", ts("2024-01-15 00:00:00")))
      .toDF("o_custkey", "o_orderkey", "o_orderpriority", "o_orderdate")
      .write.parquet(s"$d/orders.parquet")
    val rows = Relational.scd2(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getString(3),
          r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5)),
          r.getBoolean(6))).toMap
    val feb = ts("2024-02-01 00:00:00").getTime * 1000L
    val mar = ts("2024-03-01 00:00:00").getTime * 1000L
    assert(rows((7L, 1)) == ((100L, "1-URGENT",
      ts("2024-01-01 00:00:00").getTime * 1000L, Some(feb), false)))
    assert(rows((7L, 2)) == ((101L, "3-MEDIUM", feb, Some(mar), false)))
    assert(rows((7L, 3))._5 && rows((7L, 3))._4.isEmpty) // open-ended current
    assert(rows((8L, 1))._5) // single-version entity is current from birth
    assert(rows.size == 4)
  }
}
