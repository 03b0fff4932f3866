package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

import graft.ops.Relational
import graft.pipeline.FifaPipeline

/** The key semantic invariant of the reference (SURVEY.md §5.2): the
  * manual argmax join-back pattern ≡ the window-function form. */
class ArgmaxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("events: join-back and window forms agree on latest event per user") {
    // join-back keeps ts ties; the window form tie-breaks on event_id, so
    // compare on the (user_id, max event per tie-break) projection
    val jb = Relational.latestEventJoinBack(spark, TestSpark.Sf0001)
      .groupBy("user_id").agg(org.apache.spark.sql.functions.max("event_id").as("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val win = Relational.latestEventWindow(spark, TestSpark.Sf0001)
      .select("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jb == win)
    assert(jb.nonEmpty)
  }

  test("fifa: latestPerVersion join-back ≡ rank window, ties kept by both") {
    val df = Seq(
      // (team_id, fifa_version, fifa_update)
      (1, 15, 1), (1, 15, 2), (2, 15, 2), // tie at update 2 → both kept
      (1, 16, 5), (2, 16, 4),
      (3, 17, 9)
    ).toDF("team_id", "fifa_version", "fifa_update")
    def key(r: Row) = (r.getInt(0), r.getInt(1), r.getInt(2))
    val a = FifaPipeline.latestPerVersion(df).collect().map(key).toSet
    val b = FifaPipeline.latestPerVersionWindow(df).collect().map(key).toSet
    assert(a == b)
    assert(a == Set((1, 15, 2), (2, 15, 2), (1, 16, 5), (3, 17, 9)))
  }
}
