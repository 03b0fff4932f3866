package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.pipeline.FifaPipeline

/** Full team_view replica semantics on a fixture encoding every reference
  * quirk (SURVEY.md §2.4 + FIXTURES.md §A). */
class FifaPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // teams: (team_id, fifa_version, fifa_update, team_name, league_name, nationality_name)
  def teams: DataFrame = Seq(
    (1, 15, 1, "Old FC", "Liga", "Spain"),
    (1, 15, 2, "New FC", "Liga", "Spain"),  // latest of v15; name changed
    (2, 15, 2, "Two FC", "Liga", "Portugal"), // same league name, other country (F1)
    (1, 16, 1, "Newest FC", "Liga", "Spain")
  ).toDF("team_id", "fifa_version", "fifa_update", "team_name", "league_name", "nationality_name")

  // players: (player_id, fifa_version, fifa_update, club_team_id, overall,
  //           potential, value_eur, wage_eur, height_cm, weight_kg, age)
  def players: DataFrame = Seq(
    (10, 15, 1, 1, 90, 95, Some(1000L), 10L, 180, 80, 20), // stale update — excluded
    (11, 15, 2, 1, 80, 99, Some(2000L), 20L, 181, 81, 21),
    (12, 15, 2, 1, 70, 85, None, 30L, 184, 84, 24),        // null value_eur
    (13, 15, 2, 2, 60, 75, Some(500L), 5L, 170, 70, 30),
    (14, 16, 1, 1, 85, 90, Some(3000L), 40L, 190, 90, 19)
  ).toDF("player_id", "fifa_version", "fifa_update", "club_team_id", "overall",
    "potential", "value_eur", "wage_eur", "height_cm", "weight_kg", "age")

  test("SQL and DataFrame implementations produce identical team_view rows") {
    val a = FifaPipeline.teamViewSql(spark, teams, players)
    val b = FifaPipeline.teamViewDf(spark, teams, players)
    assert(a.columns.toSeq == b.columns.toSeq)
    val ka = a.collect().map(_.toSeq).toSet
    val kb = b.collect().map(_.toSeq).toSet
    assert(ka == kb)
    assert(ka.nonEmpty)
  }

  test("reference quirks: stale updates dropped, best_potential uses overall, avg truncates") {
    val rows = FifaPipeline.teamViewSql(spark, teams, players)
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r).toMap
    // canonical name = MAX(team_name) across versions → "Newest FC"
    // replaces "New FC" even in the v15 row (A2 semantics)
    val v15t1 = rows((15, "Newest FC"))
    // players 11,12 only (10 is a stale update): SUM skips null value_eur
    assert(v15t1.getLong(3) == 2000L)           // total_value
    assert(v15t1.getLong(4) == 50L)             // total_wages
    // the reference bug: best_potential_player == MAX(overall), not potential
    assert(v15t1.getInt(5) == 80 && v15t1.getInt(6) == 80)
    // CAST(AVG(...) AS INTEGER) truncates: avg(181,184)=182.5 → 182
    assert(v15t1.getInt(7) == 182)
    // league disambiguation concat
    assert(v15t1.getString(2) == "Liga - Spain")
    // canonical name via MAX over versions: v16 uses "Newest FC" (its own row)
    assert(rows.contains((16, "Newest FC")))
  }

  test("CONCAT propagates null (F1): null nationality → null league_name") {
    val t = Seq((5, 15, 1, "X FC", "L1", null.asInstanceOf[String]))
      .toDF("team_id", "fifa_version", "fifa_update", "team_name", "league_name", "nationality_name")
    val p = Seq((50, 15, 1, 5, 70, 75, Some(1L), 1L, 180, 80, 20))
      .toDF("player_id", "fifa_version", "fifa_update", "club_team_id", "overall",
        "potential", "value_eur", "wage_eur", "height_cm", "weight_kg", "age")
    val out = FifaPipeline.teamViewSql(spark, t, p).collect()
    assert(out.length == 1 && out(0).isNullAt(2))
  }
}
