package graft

/** Driver-contract guards: the oracle map must cover every query (the
  * driver records only a weak rows-only check otherwise), and the
  * flagship entry must return rows. */
class EntrySpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every query has oracle SQL") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracle for unknown query: $orphaned")
  }

  test("flagship entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("parameterized SQL binds through the injected ASOF parser (the " +
    "parsePlanWithParameters delegation — a wrapper without it loses binds)") {
    // TestSpark's session carries graft.functions.GraftExtensions, so
    // this exercises exactly the wrapper path that used to fail with
    // UNBOUND_SQL_PARAMETER
    spark.range(10).createOrReplaceTempView("graft_param_probe")
    val n = spark.sql(
      "SELECT count(*) AS n FROM graft_param_probe WHERE id > :lo",
      Map[String, Any]("lo" -> 5L)).head().getLong(0)
    assert(n == 4L)
  }

  test("lateral column aliases and GROUP BY ALL resolve (the SQL sugar " +
    "migrating warehouse queries lean on)") {
    spark.range(10).selectExpr("id", "id % 3 AS g")
      .createOrReplaceTempView("graft_sugar_probe")
    // lateral alias: x is visible to y in the SAME select list
    val r = spark.sql(
      "SELECT id + 1 AS x, x * 2 AS y FROM graft_sugar_probe WHERE id = 4")
      .head()
    assert((r.getLong(0), r.getLong(1)) == ((5L, 10L)))
    // GROUP BY ALL: every non-aggregate select item becomes a group key
    val g = spark.sql(
      "SELECT g, count(*) AS n FROM graft_sugar_probe GROUP BY ALL")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(g == Map(0L -> 4L, 1L -> 3L, 2L -> 3L), g)
  }

  test("EXECUTE IMMEDIATE: SQL-level dynamic statement with USING binds " +
    "and INTO a session variable") {
    spark.range(20).createOrReplaceTempView("graft_ei_probe")
    // USING binds parameters into the dynamic text (same substitution
    // machinery as spark.sql(text, args), driven from SQL itself)
    val n = spark.sql(
      "EXECUTE IMMEDIATE 'SELECT count(*) AS n FROM graft_ei_probe " +
        "WHERE id > ?' USING 12").head().getLong(0)
    assert(n == 7L)
    // INTO lands the result in a session variable for later statements
    spark.sql("DECLARE OR REPLACE VARIABLE graft_ei_out BIGINT")
    spark.sql("EXECUTE IMMEDIATE 'SELECT max(id) FROM graft_ei_probe' " +
      "INTO graft_ei_out")
    assert(spark.sql("SELECT graft_ei_out").head().getLong(0) == 19L)
  }

  test("SQL scripting WHILE loop: iteration count and result match the " +
    "Scala-computed expectation (loops don't oracle to one DuckDB query)") {
    val s = spark
    s.conf.set("spark.sql.scripting.enabled", "true")
    // double a cutoff until fewer than 10 customers sit above it; the
    // loop runs on the driver, each COUNT is its own distributed plan
    graft.sources.Tables.customer(s, TestSpark.Sf0001)
      .createOrReplaceTempView("graft_while_cust")
    val row = s.sql(
      """BEGIN
        |  DECLARE k BIGINT DEFAULT 100;
        |  DECLARE iters INT DEFAULT 0;
        |  WHILE (SELECT count(*) FROM graft_while_cust
        |         WHERE CAST(round(c_acctbal * 100) AS BIGINT) > k) >= 10 DO
        |    SET k = k * 2;
        |    SET iters = iters + 1;
        |  END WHILE;
        |  SELECT k, iters,
        |    (SELECT count(*) FROM graft_while_cust
        |     WHERE CAST(round(c_acctbal * 100) AS BIGINT) > k) AS n_above;
        |END""".stripMargin).head()
    // replay the loop in Scala over the same data
    val cents = graft.sources.Tables.customer(s, TestSpark.Sf0001)
      .select(org.apache.spark.sql.functions
        .expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("c"))
      .collect().map(_.getLong(0))
    var k = 100L; var iters = 0
    while (cents.count(_ > k) >= 10) { k *= 2; iters += 1 }
    assert((row.getLong(0), row.getInt(1), row.getLong(2)) ==
      ((k, iters, cents.count(_ > k).toLong)), row)
    assert(iters > 0, "degenerate corpus: the loop never ran")
  }

  test("q_approx_percentile: GK rank-error bound holds (within_bound all true)") {
    // The query ships the bound itself: within_bound = the sketch's pick
    // has rank interval overlapping n/2 ± (n/accuracy + 1). The oracle
    // asserts it TRUE under the hash gate; this spec pins the same thing
    // locally so a broken sketch fails fast in CI, not only at verify.
    val rows = SparkEntry.queries("q_approx_percentile")(spark, TestSpark.Sf0001)
      .select("event_type", "median_cents", "within_bound").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(1), s"${r.getString(0)}: null exact median")
      assert(r.getBoolean(2), s"${r.getString(0)}: GK rank bound violated")
    }
  }

  test("q_approx_distinct: HLL 3×rsd bound holds (within_bound all true)") {
    // within_bound = |approx - exact| <= 0.15 * exact (3σ at rsd 0.05),
    // computed in exact integer arithmetic inside the query; the oracle
    // asserts it TRUE, so this is the same bound the driver hash-checks.
    val rows = SparkEntry.queries("q_approx_distinct")(spark, TestSpark.Sf0001)
      .select("event_type", "exact_users", "within_bound").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2),
        s"${r.getString(0)}: HLL estimate drifted >15% from exact=${r.getLong(1)}")
    }
  }

  test("q_sketch_union: merging per-group sketches is lossless (≡ one direct sketch)") {
    import org.apache.spark.sql.functions._
    // the re-aggregation property the operator sells: HLL union is a
    // max-merge of register arrays, so union-of-parts must equal the
    // sketch built over the whole set in one pass — exactly, not ±ε
    val evs = graft.sources.Tables.events(spark, TestSpark.Sf0001)
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
    val unionOfParts = evs.groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("e"))
      .collect().head.getLong(0)
    val direct = evs
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("e"))
      .collect().head.getLong(0)
    assert(unionOfParts == direct,
      s"union-of-parts $unionOfParts != direct sketch $direct")
    // and the shipped row's bound holds
    val row = SparkEntry.queries("q_sketch_union")(spark, TestSpark.Sf0001)
      .collect().head
    assert(row.getBoolean(row.fieldIndex("within_bound")))
  }

  test("q_sketch_intersect: inclusion-exclusion exact overlap ≡ a direct " +
    "distinct self-join; sketch bound holds on every pair") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_sketch_intersect")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (pair, (_, ok)) =>
      assert(ok, s"$pair: sketch intersection outside the 3-rsd budget") }
    // exact side cross-checked against the direct pairwise overlap
    val e = graft.sources.Tables.events(spark, TestSpark.Sf0001)
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select("event_type", "user_id").distinct()
    val direct = e.as("x").join(e.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("a"), col("y.event_type").as("b"))
      .count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.foreach { case (pair, (exact, _)) =>
      assert(direct.getOrElse(pair, 0L) == exact,
        s"$pair: inclusion-exclusion $exact != direct ${direct.get(pair)}")
    }
  }
}
