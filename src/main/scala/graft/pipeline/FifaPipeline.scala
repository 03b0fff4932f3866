package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Replica of the reference's analytics job
  * (`/root/reference/prefect/spark/fifa_spark.py:24-104`): five lazily
  * composed queries — per-version argmax (A1), join-back to the latest
  * update (J1/J2), canonical team name (A2), and the team_view
  * multi-aggregate (A3/A4/F1) — over FIFA-shaped `teams` / `players`
  * tables.
  *
  * Two implementations with identical semantics:
  *   - [[teamViewSql]]: temp views + SQL strings, the reference's own
  *     composition style;
  *   - [[teamViewDf]]: the typed DataFrame chain (what we'd write).
  * Both reproduce the reference's quirks deliberately:
  *   - `best_potential_player` aggregates `overall`, NOT `potential`
  *     (`fifa_spark.py:86-87` — both maxes read the same column);
  *   - `DISTINCT(team_id)` alongside GROUP BY team_id collapses to a
  *     plain group-max (`fifa_spark.py:72-77`);
  *   - `CONCAT` is null-propagating (F1).
  */
object FifaPipeline {

  /** Step 1+2 (A1+J1): rows of `df` at the latest `fifa_update` of their
    * `fifa_version` — group-max then join back. */
  def latestPerVersion(df: DataFrame): DataFrame = {
    val latest = df.groupBy(col("fifa_version").as("v"))
      .agg(max(col("fifa_update")).as("latest_version"))
    df.join(broadcast(latest),
        df("fifa_version") === col("v") && df("fifa_update") === col("latest_version"))
      .drop("v", "latest_version")
  }

  /** The window-function equivalent of [[latestPerVersion]] — proves the
    * reference's manual argmax pattern ≡ `row_number() OVER (...)`
    * (SURVEY.md §2.5). Ties on (version, max update) keep all rows in
    * both forms, hence rank() not row_number(). */
  def latestPerVersionWindow(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("fifa_version").orderBy(col("fifa_update").desc)
    df.withColumn("graft_rank", rank().over(w))
      .filter(col("graft_rank") === 1)
      .drop("graft_rank")
  }

  /** Faithful SQL-composition replica (temp views + spark.sql). */
  def teamViewSql(spark: SparkSession, teams: DataFrame, players: DataFrame): DataFrame = {
    teams.createOrReplaceTempView("fifa_teams")
    players.createOrReplaceTempView("fifa_players")
    spark.sql(
      """SELECT fifa_version, MAX(fifa_update) AS latest_version
        |FROM fifa_teams GROUP BY fifa_version""".stripMargin)
      .createOrReplaceTempView("fifa_versions")
    spark.sql(
      """SELECT t.* FROM fifa_teams t JOIN fifa_versions v
        |ON t.fifa_version = v.fifa_version AND t.fifa_update = v.latest_version""".stripMargin)
      .createOrReplaceTempView("latest_teams")
    spark.sql(
      """SELECT p.* FROM fifa_players p JOIN fifa_versions v
        |ON p.fifa_version = v.fifa_version AND p.fifa_update = v.latest_version""".stripMargin)
      .createOrReplaceTempView("latest_players")
    spark.sql(
      """SELECT DISTINCT(team_id), MAX(team_name) AS team_name
        |FROM latest_teams GROUP BY team_id""".stripMargin)
      .createOrReplaceTempView("distinct_teams")
    spark.sql(
      """SELECT t.fifa_version, d.team_name,
        |  CONCAT(t.league_name, ' - ', t.nationality_name) AS league_name,
        |  SUM(p.value_eur) AS total_value,
        |  SUM(p.wage_eur) AS total_wages,
        |  MAX(p.overall) AS best_player,
        |  MAX(p.overall) AS best_potential_player,
        |  CAST(AVG(p.height_cm) AS INTEGER) AS avg_height,
        |  CAST(AVG(p.weight_kg) AS INTEGER) AS avg_weight,
        |  CAST(AVG(p.age) AS INTEGER) AS avg_age
        |FROM latest_teams t
        |JOIN latest_players p
        |  ON t.team_id = p.club_team_id AND t.fifa_version = p.fifa_version
        |JOIN distinct_teams d ON t.team_id = d.team_id
        |GROUP BY t.fifa_version, d.team_name, t.league_name, t.nationality_name""".stripMargin)
  }

  /** Same semantics as [[teamViewSql]], typed DataFrame chain. */
  def teamViewDf(spark: SparkSession, teams: DataFrame, players: DataFrame): DataFrame = {
    val latestTeams = latestPerVersion(teams)
    val latestPlayers = latestPerVersion(players)
    val distinctTeams = latestTeams
      .groupBy(col("team_id").as("d_team_id"))
      .agg(max(col("team_name")).as("d_team_name"))
    latestTeams.as("t")
      .join(latestPlayers.as("p"),
        col("t.team_id") === col("p.club_team_id") &&
          col("t.fifa_version") === col("p.fifa_version"))
      .join(broadcast(distinctTeams), col("t.team_id") === col("d_team_id"))
      .groupBy(col("t.fifa_version"), col("d_team_name"),
        col("t.league_name"), col("t.nationality_name"))
      .agg(
        sum(col("p.value_eur")).as("total_value"),
        sum(col("p.wage_eur")).as("total_wages"),
        max(col("p.overall")).as("best_player"),
        max(col("p.overall")).as("best_potential_player"),
        avg(col("p.height_cm")).cast("int").as("avg_height"),
        avg(col("p.weight_kg")).cast("int").as("avg_weight"),
        avg(col("p.age")).cast("int").as("avg_age"))
      .select(
        col("fifa_version"), col("d_team_name").as("team_name"),
        concat(col("league_name"), lit(" - "), col("nationality_name")).as("league_name"),
        col("total_value"), col("total_wages"),
        col("best_player"), col("best_potential_player"),
        col("avg_height"), col("avg_weight"), col("avg_age"))
  }
}
