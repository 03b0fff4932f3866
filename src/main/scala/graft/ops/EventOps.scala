package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact._
import graft.sources.Tables

/** Event-time operators over the `events` table — the batch forms of the
  * north-star streaming semantics (SURVEY.md §7.5). Each op is expressed
  * with Spark's native event-time primitives (`window`, `session_window`,
  * `get_json_object`) so the same plan fragment lifts onto a readStream
  * source unchanged (see graft.streaming.StreamOps).
  */
object EventOps {

  /** JSON property extraction (north-star: events.props is a JSON string).
    * Spark-side uses the real JSON path evaluator; the oracle mirrors it
    * with a regexp — same extracted values. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"),
        count(lit(1)).as("n"))

  /** SQL-DEFINED FUNCTIONS (Spark 4 `CREATE FUNCTION … RETURN`): a
    * scalar UDF and a TABLE function written in SQL — Catalyst INLINES
    * the body at plan time (no JVM closure, no codegen boundary, full
    * pushdown through the function), which is the engine's answer to
    * "users need abstractions" without the classic UDF black-box tax.
    * `graft_cents` is the cents discipline as a reusable function,
    * `graft_bucket` composes over it, and the table function
    * `graft_hot_users(min_cents)` parameterizes a HAVING aggregate.
    * Oracle: the same SQL with every function body inlined by hand. */
  def sqlUdf(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).createOrReplaceTempView("graft_udf_events")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_cents(x DOUBLE)
      RETURNS BIGINT RETURN CAST(round(x * 100) AS BIGINT)""")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_bucket(v BIGINT)
      RETURNS STRING RETURN
      CASE WHEN v < 2500 THEN 'low' WHEN v < 7500 THEN 'mid' ELSE 'high' END""")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_hot_users(min_cents BIGINT)
      RETURNS TABLE(user_id BIGINT, total_cents BIGINT) RETURN
      SELECT user_id, CAST(sum(graft_cents(value)) AS BIGINT)
      FROM graft_udf_events
      WHERE user_id IS NOT NULL AND value IS NOT NULL
      GROUP BY 1 HAVING sum(graft_cents(value)) >= min_cents""")
    spark.sql(
      """SELECT user_id, total_cents,
        |  graft_bucket(total_cents % 10000) AS cents_bucket
        |FROM graft_hot_users(200000)""".stripMargin)
  }

  /** COLLATIONS (Spark 4 `COLLATE UTF8_LCASE`): case-insensitive
    * equality/grouping as a TYPE property instead of `lower()`
    * normalization scattered through every predicate — the engine
    * compares under the collation everywhere the value flows (grouping,
    * equality, joins), which is the governed way to make "EN" and "en"
    * one language. A mixed-case view is manufactured deterministically
    * (even doc_ids upper-cased), grouped under the collation, and the
    * group key is re-lowered + cast back to a plain string for the
    * cross-engine compare (a collated string TYPE in the output schema
    * would be a Spark-only artifact). Oracle: the same grouping via
    * explicit `lower()` — collation semantics must equal the manual
    * normalization it replaces. */
  def collation(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("graft_coll_docs")
    spark.sql(
      """WITH mixed AS (
        |  SELECT CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END
        |      AS lang_mixed,
        |    n_chars
        |  FROM graft_coll_docs
        |  WHERE lang IS NOT NULL AND doc_id IS NOT NULL
        |    AND n_chars IS NOT NULL)
        |SELECT CAST(lower(lang_mixed COLLATE UTF8_LCASE) AS STRING) AS lang,
        |  count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(CASE WHEN lang_mixed = ('en' COLLATE UTF8_LCASE)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_en
        |FROM mixed
        |GROUP BY lang_mixed COLLATE UTF8_LCASE""".stripMargin)
  }

  /** SESSION VARIABLES + `IDENTIFIER()` (Spark 4 `DECLARE VARIABLE` /
    * `SET VAR`): SQL-level state that outlives a statement — the
    * session-parameterization face scripting builds on, usable from
    * plain `spark.sql` with no BEGIN…END block. The variable picks the
    * metric COLUMN by name and `IDENTIFIER(var)` turns that string into
    * a resolved column reference at plan time — dynamic SQL without
    * string concatenation (the identifier is validated by the resolver,
    * not spliced as text). Oracle: the same query with the choice
    * inlined. */
  def sqlVariables(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_var_li")
    spark.sql("DECLARE OR REPLACE VARIABLE graft_metric_col STRING")
    spark.sql("SET VAR graft_metric_col = 'l_extendedprice'")
    spark.sql("DECLARE OR REPLACE VARIABLE graft_min_qty DOUBLE")
    spark.sql("SET VAR graft_min_qty = 25.0")
    spark.sql(
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(round(IDENTIFIER(graft_metric_col) * 100)
        |    AS BIGINT)) AS BIGINT) AS metric_cents
        |FROM graft_var_li
        |WHERE l_quantity >= graft_min_qty AND l_returnflag IS NOT NULL
        |GROUP BY 1""".stripMargin)
  }

  /** PARAMETERIZED SQL (`spark.sql(text, args)`): named parameter
    * binds — the injection-safe templating face every SQL-fronting
    * service needs (values enter the PLAN as literals through the
    * parser's parameter substitution, never through string
    * concatenation; a malicious segment string is just an unmatched
    * value). Constant-folding and pushdown see real literals, so the
    * bound plan is byte-identical to the hand-written one. Oracle: the
    * same query with the parameters inlined. */
  def sqlParams(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("graft_param_orders")
    spark.sql(
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM graft_param_orders
        |WHERE o_orderstatus = :status AND o_totalprice > :floor
        |  AND o_orderpriority IS NOT NULL
        |GROUP BY 1""".stripMargin,
      Map("status" -> "O", "floor" -> 1000.0))
  }

  /** SQL SCRIPTING (Spark 4 `BEGIN … END` blocks,
    * `spark.sql.scripting.enabled`): session variables + control flow
    * in pure SQL — the stored-procedure-shaped orchestration a
    * warehouse migration carries over without a driver program. The
    * script DECLAREs a variable, fills it from a query (the dominant
    * market segment), branches on it, and the block's result is the
    * last statement's result set: the per-nation rollup of that
    * segment. Control flow runs on the DRIVER (each statement is its
    * own distributed plan; the loop never touches rows), so the scale
    * shape is identical to issuing the statements separately — the
    * feature is surface, not a new execution model. A WHILE-loop
    * variant is pinned in RelationalSpec (its iteration count is
    * checked against a Scala-computed expectation; loops don't oracle
    * to one DuckDB query). Oracle: the same logic as one static SQL
    * query — variable inlined as a scalar subquery. */
  def sqlScript(parent: SparkSession, dir: String): DataFrame = {
    // child session: scripting.enabled (and the temp views) stay scoped
    val spark = parent.newSession()
    spark.conf.set("spark.sql.scripting.enabled", "true")
    Tables.customer(spark, dir).createOrReplaceTempView("graft_script_cust")
    Tables.nation(spark, dir).createOrReplaceTempView("graft_script_nat")
    spark.sql(
      """BEGIN
        |  DECLARE top_seg STRING;
        |  SET top_seg = (SELECT c_mktsegment FROM graft_script_cust
        |    WHERE c_mktsegment IS NOT NULL
        |    GROUP BY 1 ORDER BY count(*) DESC, c_mktsegment LIMIT 1);
        |  IF top_seg IS NOT NULL THEN
        |    SELECT n_name, count(*) AS n_cust,
        |      CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |        AS acctbal_cents
        |    FROM graft_script_cust
        |    JOIN graft_script_nat ON c_nationkey = n_nationkey
        |    WHERE c_mktsegment = top_seg AND c_acctbal IS NOT NULL
        |    GROUP BY 1;
        |  END IF;
        |END""".stripMargin)
  }

  /** RECURSIVE CTE (Spark 4 `WITH RECURSIVE`): sessionization as a
    * recursive WALK — session heads (first event, or a >30 min gap from
    * the previous) anchor the recursion, and each level follows the
    * `next event within 30 min` link precomputed by a window, so the
    * recursion is LINEAR (out-degree 1 — rows bounded by events, never
    * path-exploding; Spark's recursive CTEs are UNION ALL-only, so
    * shapes must be chosen with that bound in mind). Depth caps at 50,
    * mirrored in the oracle: both engines orphan the tail of a longer
    * chain identically. One join per level is the recursive-SQL
    * execution model — the engine's SCALE path for sessionization is
    * the single-pass gaps-and-islands window (q_session_stats); this
    * pins the SQL surface agrees with it. Oracle: the identical
    * recursion in DuckDB. */
  def recursiveSessionWalk(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).createOrReplaceTempView("graft_rec_events")
    spark.sql(
      """WITH RECURSIVE e AS (
        |  SELECT user_id, event_id, unix_micros(ts) AS ts_us,
        |    LEAD(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_id,
        |    LEAD(unix_micros(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts_us,
        |    LAG(unix_micros(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts_us
        |  FROM graft_rec_events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL),
        |walk AS (
        |  SELECT user_id, event_id, ts_us, next_id, next_ts_us,
        |    event_id AS session_head, CAST(0 AS BIGINT) AS depth
        |  FROM e
        |  WHERE prev_ts_us IS NULL OR ts_us - prev_ts_us > 1800000000
        |  UNION ALL
        |  SELECT e.user_id, e.event_id, e.ts_us, e.next_id, e.next_ts_us,
        |    w.session_head, w.depth + 1
        |  FROM walk w JOIN e ON e.user_id = w.user_id AND e.event_id = w.next_id
        |  WHERE w.next_ts_us - w.ts_us <= 1800000000 AND w.depth < 50)
        |SELECT session_head, user_id, count(*) AS n_events,
        |  max(depth) AS max_depth
        |FROM walk GROUP BY 1, 2""".stripMargin)
  }

  /** Semi-structured props through Spark 4's VARIANT type: `parse_json`
    * turns the JSON string into the binary variant encoding ONCE, and
    * typed `variant_get` paths extract from it without re-parsing — the
    * open-format answer to a JSON column read many times (shredded
    * variant parquet pushes these extractions into the scan itself:
    * the parquet reader here already reports `PushedVariantExtractions`
    * for stored VARIANT columns). `try_variant_get` on an absent path
    * is NULL, never an error — counted to pin the miss semantics.
    * Oracle: DuckDB's JSON extraction over the same strings. */
  def variantExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("props").isNotNull)
      .select(col("event_type"), parse_json(col("props")).as("v"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"),
        expr("try_variant_get(v, '$.missing', 'bigint')").as("m"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        count(col("m")).as("n_miss_hits"))

  /** Tumbling 1-hour event-time windows (counts + exact cents). A null
    * timestamp cannot be windowed: Spark's window generator would drop
    * the row while the oracle's date_trunc(NULL) groups it — exclude
    * explicitly, mirrored in the oracle WHERE. */
  def tumblingHour(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(cents(col("value"))).as("value_cents"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"), col("value_cents"))

  /** Sliding windows: 1 hour long, every 30 minutes — each event lands in
    * exactly two windows. */
  def slidingHour(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull) // see tumblingHour
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(cents(col("value"))).as("value_cents"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"), col("value_cents"))

  /** As-of join: for each event, the time of the user's most recent order
    * at or before the event (DuckDB expresses this natively as ASOF JOIN;
    * Spark has no such operator). Implemented with the scalable
    * union+window pattern: tag both streams, union, sort within each key
    * partition by (time, orders-first), and take the running max of the
    * order-time column — one shuffle per side, no per-row probing, works
    * at any key cardinality. Only the matched TIME is emitted: tied
    * order rows at the same timestamp would make row identity
    * engine-dependent, the as-of time itself is deterministic.
    */
  def asofLastOrder(spark: SparkSession, dir: String): DataFrame = {
    // null keys/times excluded on both sides: ASOF equality never matches
    // NULL, but the union+window emulation would co-partition NULL keys
    // (partitionBy treats NULLs as equal) and fabricate a match
    val ev = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id").as("k"), col("ts").cast("timestamp").as("t"),
        col("event_id"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_custkey").isNotNull)
      .select(col("o_custkey").as("k"), col("o_orderdate").cast("timestamp").as("t"))
    val unioned = ev
      .withColumn("ot", lit(null).cast("timestamp"))
      .unionByName(ord
        .withColumn("event_id", lit(null).cast("long"))
        .withColumn("ot", col("t")))
    // at equal t the order row sorts first (null event_id) → ts >= orderdate inclusive
    val w = Window.partitionBy("k")
      .orderBy(col("t").asc, col("event_id").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("asof_t", max(col("ot")).over(w))
      .filter(col("event_id").isNotNull && col("asof_t").isNotNull)
      .select(col("event_id"), col("k").as("user_id"),
        unix_micros(col("t")).as("ts_us"),
        unix_micros(col("asof_t")).as("asof_order_us"))
  }

  /** [[asofLastOrder]] recomputed through the engine's OWN physical
    * operator — [[graft.plans.AsOfMergeJoinExec]], the custom
    * LogicalPlan → Strategy → SparkPlan path registered via
    * `SparkSessionExtensions` — instead of the union+window emulation.
    * Same result set, same one-exchange-per-side plan, but the merge
    * consumes the per-key sort orders in a single O(1)-state pass
    * rather than sorting and windowing the UNION of both inputs.
    * Unmatched probes drop (`asof_t IS NOT NULL`) to mirror the
    * oracle's inner ASOF JOIN; the operator itself emits them as NULL
    * so a left-as-of caller keeps them. */
  def asofLastOrderExec(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("ts").isNotNull) // oracle excludes null probe times
      .select(col("user_id"), col("ts").cast("timestamp").as("t"),
        col("event_id"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        col("o_orderdate").cast("timestamp").as("ot"))
    graft.plans.AsOfJoinOp(ev, "user_id", "t", ord, "o_custkey", "ot")
      .filter(col("asof_t").isNotNull)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("t")).as("ts_us"),
        unix_micros(col("asof_t")).as("asof_order_us"))
  }

  /** The SAME as-of join through the SQL front end: `ASOF JOIN` syntax
    * parsed by [[graft.plans.GraftSqlParser]] (injectParser), lowered
    * onto the identical [[graft.plans.AsOfJoin]] logical node, planned
    * by the identical strategy into [[graft.plans.AsOfMergeJoinExec]] —
    * AsOfJoinSpec pins plan equality with [[asofLastOrderExec]]'s
    * DataFrame path. One operator, two front ends; the oracle is
    * DuckDB's native `ASOF JOIN`, making this the rare extension whose
    * SYNTAX is oracle-checkable too. */
  def asofLastOrderSql(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), col("ts").cast("timestamp").as("t"),
        col("event_id"))
      .createOrReplaceTempView("graft_asof_ev")
    Tables.orders(spark, dir)
      .select(col("o_custkey"),
        col("o_orderdate").cast("timestamp").as("ot"))
      .createOrReplaceTempView("graft_asof_ord")
    spark.sql(
      """SELECT event_id, user_id, unix_micros(t) AS ts_us,
        |  unix_micros(asof_t) AS asof_order_us
        |FROM graft_asof_ev ASOF JOIN graft_asof_ord
        |  ON graft_asof_ev.user_id = graft_asof_ord.o_custkey
        |  AND graft_asof_ev.t >= graft_asof_ord.ot
        |WHERE asof_t IS NOT NULL""".stripMargin)
  }

  /** Range (interval) self-join via time-bucketing: unordered pairs of
    * same-user events at most 5 minutes apart. Spark has no native range
    * join, and the naive key-only self-join explodes before its time
    * filter; bucketing by the interval length and probing {bucket,
    * bucket+1} bounds each join group to two 5-minute slices — each
    * qualifying pair matches exactly one probe key, so no dedup pass.
    */
  def rangeJoinPairs(spark: SparkSession, dir: String): DataFrame = {
    val IntervalUs = 5L * 60 * 1000000
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val a = ev
      .withColumn("bucket",
        explode(array(expr(s"ts_us div $IntervalUs"), expr(s"ts_us div $IntervalUs + 1"))))
      .select(col("user_id"), col("bucket"),
        col("event_id").as("id_a"), col("ts_us").as("ts_a"))
    val b = ev
      .withColumn("bucket", expr(s"ts_us div $IntervalUs"))
      .select(col("user_id"), col("bucket"),
        col("event_id").as("id_b"), col("ts_us").as("ts_b"))
    a.join(b, Seq("user_id", "bucket"))
      .filter((col("ts_b") - col("ts_a")).between(0L, IntervalUs) &&
        (col("ts_a") < col("ts_b") ||
          (col("ts_a") === col("ts_b") && col("id_a") < col("id_b"))))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Exact discrete percentiles (median + p90) of order value per
    * priority class: the sorted element at 0-based index (n-1)*p, with
    * the index computed in INTEGER arithmetic — interpolated percentiles
    * (Spark `percentile` vs DuckDB `quantile_cont`) differ by 1 ulp
    * because the engines factor the lerp differently, so no doubles
    * appear anywhere here. */
  def percentiles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy(col("price_c").asc)
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"), cents(col("o_totalprice")).as("price_c"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("o_orderpriority")))
      .groupBy("o_orderpriority")
      .agg(
        max(when(col("rn") === expr("(n-1) div 2") + 1, col("price_c")))
          .as("median_cents"),
        max(when(col("rn") === expr("((n-1)*9) div 10") + 1, col("price_c")))
          .as("p90_cents"),
        count(lit(1)).as("n"))
  }

  /** Approximate-percentile sketch (Greenwald–Khanna summaries) — the
    * second sketch family after [[approxDistinct]] for 100 TB quantile
    * estimation in one pass with bounded memory. The raw sketch pick is
    * engine- and merge-order-specific, so the query emits the EXACT
    * discrete median plus `within_bound`: the GK guarantee (rank error
    * ≤ n/accuracy) evaluated against the sketch's actual pick, in
    * integer arithmetic. The oracle recomputes the exact side and
    * asserts the boolean TRUE — a broken sketch flips the column and
    * fails the hash gate, not just a spec. */
  def approxPercentile(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir)
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), cents(col("value")).as("cents"))
    val sk = base.groupBy(col("event_type").as("et"))
      .agg(percentile_approx(col("cents"), lit(0.5), lit(PctAccuracy)).as("approx"),
        count(lit(1)).as("n"))
    // exact discrete median: the value at 0-based integer index (n-1)/2
    // (same no-lerp rule as [[percentiles]]; ties share a value, so the
    // picked VALUE is deterministic even though row order among equal
    // cents is not)
    val w = Window.partitionBy("event_type").orderBy(col("cents").asc)
    val ex = base
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("event_type")))
      .groupBy(col("event_type").as("et2"))
      .agg(max(when(col("rn") === expr("(cnt-1) div 2") + 1, col("cents")))
        .as("median_cents"))
    // rank interval of the sketch's pick: [#(< v), #(<= v)] must overlap
    // n/2 ± (n/accuracy + 1); scaled by 2*accuracy to stay in exact ints
    val bounds = base.join(sk, col("event_type") === col("et"))
      .groupBy("et", "approx", "n")
      .agg(sum(when(col("cents") < col("approx"), 1L).otherwise(0L)).as("lo"),
        sum(when(col("cents") <= col("approx"), 1L).otherwise(0L)).as("hi"))
    bounds.join(ex, col("et") === col("et2"))
      .select(col("et").as("event_type"), col("median_cents"), col("n"),
        (col("lo") * (2 * PctAccuracy) <= col("n") * (PctAccuracy + 2) + 2 * PctAccuracy &&
          col("hi") * (2 * PctAccuracy) >= col("n") * (PctAccuracy - 2) - 2 * PctAccuracy)
          .as("within_bound"))
  }

  /** GK accuracy: rank error ≤ n / accuracy. */
  val PctAccuracy = 1000

  /** HLL sketch distinct counts next to the exact form — the approximate
    * path for 100 TB cardinality estimation. HLL++ internals are
    * engine-specific, so the raw estimate stays out of the output:
    * the query emits the exact count plus `within_bound` — the sketch's
    * relative error vs the exact count held under 3×rsd (rsd 0.05,
    * ~99.7% of sketches), in exact integer arithmetic. The oracle
    * recomputes the exact side and asserts the boolean TRUE, putting
    * the sketch under the driver's hash gate. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("exact_users"), col("n"),
        (abs(col("approx_users") - col("exact_users")) * 100 <=
          col("exact_users") * 15).as("within_bound"))

  /** MERGEABLE-sketch re-aggregation — the property that makes
    * pre-aggregated OLAP cubes work at 100 TB: per-event_type
    * DataSketches HLL sketches of the user set are built once
    * (each a few KB, whatever the group size), then UNIONED into the
    * global cardinality WITHOUT re-touching the rows — a max-merge of
    * register arrays, lossless for HLL. Re-aggregation is what plain
    * `approx_count_distinct` cannot do (its estimate is terminal); a
    * sketch column rolls up along any dimension hierarchy. Sketch
    * internals stay out of the output (engine-specific bytes): the row
    * emits the exact union cardinality + `within_bound` (union estimate
    * within 3×rse ≈ 5% of exact at lgK=12; +1 absorbs tiny-corpus
    * rounding), and DedupSpec pins the lossless-merge property —
    * union-of-parts estimate ≡ single-sketch estimate. */
  def sketchUnion(spark: SparkSession, dir: String): DataFrame = {
    val evs = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
    val perType = evs.groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val merged = perType.agg(count(lit(1)).as("n_sketches"),
      // zero sketch rows (empty/all-null input) union to a NULL sketch;
      // estimate 0 keeps within_bound TRUE like the oracle's constant
      // (est can only be null when no valid row existed, so exact is 0)
      coalesce(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))),
        lit(0L)).as("est"))
    val exact = evs.agg(countDistinct(col("user_id")).as("exact_users"))
    merged.crossJoin(exact) // two 1-row aggregates
      .select(col("n_sketches"), col("exact_users"),
        (abs(col("est") - col("exact_users")) * 100 <=
          col("exact_users") * 5 + 100).as("within_bound"))
  }

  /** Sketch SET ALGEBRA — audience overlap |A ∩ B| for every unordered
    * pair of event types by inclusion–exclusion (|A|+|B|−|A∪B|) over
    * HLL estimates: the segment-overlap question every analytics stack
    * answers from pre-built sketches because the exact self-join is a
    * second full pass. Pairs come from the bounded type domain (tiny
    * broadcast cross, never row data); each event fans out only to the
    * pairs containing its type, then ONE hash agg computes exact and
    * sketch cardinalities for A, B, and A∪B per pair side by side.
    * Output follows the [[approxDistinct]] oracle discipline: the exact
    * intersection (inclusion–exclusion over exact counts — itself exact)
    * plus `within_bound` = sketch-derived intersection within 3×rsd of
    * each of the three contributing estimates (error budget
    * 15% × (|A|+|B|+|A∪B|), +1 for tiny-corpus rounding); DuckDB
    * recomputes the exact side and asserts the boolean TRUE. */
  def sketchIntersect(spark: SparkSession, dir: String): DataFrame = {
    val evs = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
    // materializeOnce: the pair crossJoin reads the bounded type domain
    // on both sides — one distinct scan of events, not two (the
    // unpersist-stale step keeps later identical invocations honest)
    val types = graft.ingest.Materialize.materializeOnce("sketchIntersect.types",
      evs.select(col("event_type")).distinct())
    val pairs = types.select(col("event_type").as("type_a"))
      .crossJoin(types.select(col("event_type").as("type_b")))
      .filter(col("type_a") < col("type_b")) // domain × domain, broadcast-tiny
    // Two-level aggregation instead of three countDistincts in one agg:
    // multi-distinct planning EXPANDS every joined row 4x before the
    // distinct shuffle (Expand node — 4x the rows through the widest
    // exchange). Level 1 reduces to one row per (pair, user) with
    // membership flags (map-side partial agg applies); level 2 computes
    // the same quantities: count(*) over per-user rows ≡ countDistinct
    // (user), sum(flag) ≡ countDistinct(when(type=x, user)), and the HLL
    // estimates are unchanged because a sketch over the DISTINCT user set
    // is the identical sketch over the raw multiset (HLL is insensitive
    // to duplicates; when(flag,user) keeps the same value set as
    // when(type=x, user)).
    evs.join(broadcast(pairs),
        col("event_type") === col("type_a") ||
          col("event_type") === col("type_b"))
      .groupBy("type_a", "type_b", "user_id")
      .agg(
        max(when(col("event_type") === col("type_a"), 1L).otherwise(0L))
          .as("in_a"),
        max(when(col("event_type") === col("type_b"), 1L).otherwise(0L))
          .as("in_b"))
      .groupBy("type_a", "type_b")
      .agg(
        count(lit(1)).as("exact_u"),
        approx_count_distinct(col("user_id")).as("est_u"),
        sum(col("in_a")).as("exact_a"),
        approx_count_distinct(when(col("in_a") === 1L, col("user_id")))
          .as("est_a"),
        sum(col("in_b")).as("exact_b"),
        approx_count_distinct(when(col("in_b") === 1L, col("user_id")))
          .as("est_b"))
      .select(col("type_a"), col("type_b"),
        (col("exact_a") + col("exact_b") - col("exact_u"))
          .as("exact_intersect"),
        (abs((col("est_a") + col("est_b") - col("est_u")) -
          (col("exact_a") + col("exact_b") - col("exact_u"))) * 100 <=
          (col("exact_a") + col("exact_b") + col("exact_u")) * 15 + 100)
          .as("within_bound"))
  }

  /** Conversion funnel (view → click → purchase): per user, the first
    * view, the first click AT OR AFTER that view, and the first purchase
    * at or after that click — the sequential-pattern analytics a product
    * pipeline runs daily. Three stage-filtered min-aggregations joined
    * on user_id: every shuffle is on the same key, so after the first
    * exchange the stages co-partition (no repeated wide shuffles), and
    * each stage's input is pre-filtered to its event type before the
    * join. Times are exact epoch-µs minima — fully deterministic. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("view_us"))
    val c = e.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("us") >= col("view_us"))
      .groupBy("user_id").agg(min(col("us")).as("click_us"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("us") >= col("click_us"))
      .groupBy("user_id").agg(min(col("us")).as("purchase_us"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select("user_id", "view_us", "click_us", "purchase_us")
  }

  /** Cohort retention: users cohorted by first-active epoch week, then
    * for each (cohort, week offset) the count of still-active users and
    * the retention per-mille — the triangle matrix every growth
    * dashboard draws. Weeks are exact integer `epoch_µs div week_µs`
    * (no calendar arithmetic to diverge on).
    *
    * Scale shape: ONE shuffle on user_id computes both the cohort week
    * (min) and the distinct active-week set per user (`collect_set` is
    * bounded by the corpus duration in weeks — a few hundred even for a
    * decade — so the aggregation row can never blow up the way a
    * per-event list would); the exploded (cohort, offset) pairs then
    * aggregate on the cohort key. Cohort sizes come from a window over
    * the ALREADY-AGGREGATED matrix (offset 0 is the cohort by
    * construction — every user is active in their own first week), not
    * a self-join: no branch recomputes the user-level aggregate, and
    * the window's exchange moves only matrix-sized data. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val WeekUs = 7L * 86400 * 1000000
    val active = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"),
        idiv(unix_micros(col("ts")), lit(WeekUs)).as("week"))
      .groupBy("user_id")
      .agg(min(col("week")).as("cohort_week"),
        collect_set(col("week")).as("weeks"))
      .select(col("cohort_week"), explode(col("weeks")).as("week"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    active
      .withColumn("cohort_users",
        max(when(col("week_offset") === 0L, col("n_active")))
          .over(Window.partitionBy("cohort_week")))
      .withColumn("retained_permille",
        idiv(col("n_active") * 1000, col("cohort_users")))
  }

  /** Pivot: per-user event-type counts as columns (explicit value list so
    * the plan needs no discovery pass; absent combos fill 0). */
  def pivotEventCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      // fill ONLY the pivoted count cells: an unqualified na.fill(0)
      // would also rewrite a NULL user_id group key to 0
      .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))

  /** CUBE over (event_type, day-of-month) — the full grouping-set lattice
    * (rollup's sibling), via SQL like the reference composes queries. */
  def cubeEventDay(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).createOrReplaceTempView("graft_events")
    spark.sql(
      """SELECT event_type, dayofmonth(ts) AS dom, count(*) AS n
        |FROM graft_events
        |GROUP BY CUBE(event_type, dayofmonth(ts))""".stripMargin)
  }

  /** Session windows with a 30-minute inactivity gap, rolled up per user.
    * Spark's `session_window` plans a native SessionWindow aggregation;
    * the oracle is the classic gaps-and-islands form (lag + cumulative
    * sum), which is semantically identical for point events: a new
    * session starts when ts - prev_ts >= gap. */
  def sessionStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull) // see tumblingHour
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n")).as("n_events"),
        max(col("n")).as("max_session"))

  /** Hourly resample with gap fill: a dense (hour × event_type) grid from
    * a `sequence` spine between the corpus bounds, left-joined with the
    * per-hour counts and zero-filled — the time-series regularization
    * step before any windowed model sees the data. Fully distributed: the
    * bounds are a 1-row aggregate, the spine explodes from it, and the
    * count side is the usual two-phase hash aggregate; no collect. */
  def resampleHourly(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val spine = ev
      .agg(date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("hour"))
    val types = ev.select(col("event_type")).distinct()
    val counts = ev
      .groupBy(date_trunc("hour", col("ts")).as("chour"), col("event_type").as("ctype"))
      .agg(count(lit(1)).as("n"))
    spine.crossJoin(types)
      .join(counts, col("hour") === col("chour") && col("event_type") === col("ctype"), "left")
      .select(unix_micros(col("hour")).as("hour_us"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Forward-fill (last observation carried forward) — the gap-repair
    * primitive a sensor/feature pipeline runs before windowed models:
    * per user in event order, a null value takes the most recent
    * non-null one (`last(..., ignoreNulls)` / the oracle's
    * `last_value(... IGNORE NULLS)`); first_cents is the backfill
    * anchor. Null order keys are excluded (an unordered observation
    * can't be filled); null values are the point and stay. */
  def locfValues(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("event_id").asc) // us-epoch ≡ ts order
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        cents(col("value")).as("value_cents"))
      .withColumn("locf_cents", last(col("value_cents"), ignoreNulls = true).over(w))
      .withColumn("first_cents", first(col("value_cents"), ignoreNulls = true).over(w))
  }

  /** UNPIVOT (melt): the wide per-user event-count matrix back to long
    * form — the inverse of [[pivotEventCounts]], keeping explicit zero
    * cells (the grid semantics a feature matrix needs). */
  def unpivotEventCounts(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    pivotEventCounts(spark, dir)
      .unpivot(Array(col("user_id")), types.map(col).toArray, "event_type", "n")
  }

  /** MapType surface: props parsed with `from_json` into
    * `map<string,string>`, then map_keys / size / element_at — the
    * schema-flexible path for semi-structured payloads whose keys aren't
    * known at compile time (vs [[jsonExtract]]'s fixed-field regex).
    * String values deliberately: a `map<string,bigint>` schema would
    * null the ENTIRE map if any one value were non-integer, while the
    * oracle's json functions parse per-key — so parse loosely and cast
    * the key we need. Keys are emitted sorted-joined so the output stays
    * scalar for the oracle compare. */
  def jsonMap(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      // NULL props: legacy size(NULL) = -1 and concat_ws over a null
      // array = "" while the oracle yields NULLs — no payload, no row
      .filter(col("props").isNotNull)
      .withColumn("m", coalesce(
        from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)),
        // non-object JSON (array/scalar): from_json yields a NULL map but
        // the oracle's json_keys yields [] — normalize to the empty map.
        // Contract: props is valid JSON or NULL (json_keys errors on
        // malformed input, so there is no cross-engine malformed policy).
        map()))
      .select(col("event_id"),
        concat_ws(",", array_sort(map_keys(col("m")))).as("keys"),
        size(col("m")).cast("long").as("n_keys"),
        element_at(col("m"), "k").cast("long").as("k"))

  /** Time-interval window frame (RANGE, not ROWS): per event, the count
    * and exact cents sum of the same user's events in the trailing hour.
    * Ordering by epoch SECONDS (cast ts → long ≡ the oracle's
    * `epoch_us//1_000_000`, both floor) makes same-second events RANGE
    * peers in both engines; the frame [-3600, 0] is inclusive on both
    * ends in both engines. One shuffle on user_id, sliding-frame
    * evaluation within each partition. */
  def trailingHourFrame(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").cast("long"))
      .rangeBetween(-3600, 0)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        graft.functions.Exact.cents(col("value")).as("v"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("v")).over(w).as("cents_1h"))
  }

  /** Exponentially-weighted moving average per user — the sequential
    * per-key FOLD family (smoothing, decay features) that no window
    * frame can express: each step depends on the previous step's
    * output, `s := (s + x) div 2` (α = 1/2 kept in exact integer cents,
    * so both engines truncate identically instead of accumulating FP
    * error). Spark shape: ONE hash shuffle on user_id collects each
    * user's (ts, event_id, cents) triples, `array_sort` orders them by
    * event time (event_id breaks ts ties), and the `aggregate` HOF runs
    * the fold as codegen'd array work — no UDF, no driver path. Per-key
    * state is the user's own event list, the irreducible working set of
    * any order-dependent fold (the same bound mapGroupsWithState carries
    * in streaming); keys are independent, so 1000 executors each fold
    * their own users. Oracle: a recursive CTE stepping rn → rn+1 — the
    * sequential semantics stated directly. Only the FINAL smoothed value
    * per user is emitted (output is key-bounded, never event-bounded).
    * Negative-value rows are excluded up front: keeping cents ≥ 0 makes
    * Spark's `div` and DuckDB's `//` (both truncate toward zero) agree
    * with floor division, removing the one operand regime where integral
    * division semantics could drift. */
  /** The fold core over any `(user_id, us, event_id, c)` set (c ≥ 0) —
    * package-visible so the property spec can drive generated sequences
    * against a plain sequential Scala fold. */
  private[graft] def ewmaOf(rows: DataFrame): DataFrame =
    rows
      .select(col("user_id"),
        struct(col("us"), col("event_id"), col("c")).as("s"))
      .groupBy("user_id")
      .agg(array_sort(collect_list(col("s"))).as("xs"))
      .select(col("user_id"), size(col("xs")).cast("long").as("n_events"),
        // -1 sentinel = "no previous state"; first element seeds the fold
        expr("aggregate(xs, CAST(-1 AS BIGINT)," +
          " (acc, x) -> IF(acc < 0, x.c, (acc + x.c) div 2))").as("ewma_cents"))

  def ewmaPerUser(spark: SparkSession, dir: String): DataFrame =
    ewmaOf(Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_id").isNotNull && col("value").isNotNull && col("value") >= 0)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), cents(col("value")).as("c")))

  /** First-order Markov transitions over user event sequences — the
    * user-journey / sequence-mining shape (what follows a click?): for
    * each user's time-ordered stream, count (event_type → next
    * event_type) pairs corpus-wide. One shuffle partitions by user, the
    * `lead` window walks each sequence in place, and the transition
    * aggregate is map-side combinable over a |types|² -bounded result.
    * Tail events (no successor) are the row the lead drops in both
    * engines. */
  def transitionCounts(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts")), col("event_id"))
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_id").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Synthetic per-event interval durations for [[intervalMerge]]:
    * 60..600 s, an exact-integer function of the value column (prime
    * modulus so durations spread). */
  val IvDurModulusS = 541
  val IvDurFloorS = 60

  /** Interval union — merge each user's overlapping [start, end]
    * intervals into maximal covered spans (the coverage/availability
    * primitive: machine uptime from lease intervals, listener-hours
    * from play spans). Distinct from [[sessionStats]]'s point-gap
    * sessionization: intervals have extent, so a long interval can
    * swallow many later short ones and a fixed inactivity gap gets the
    * span boundaries wrong — the classic form is the cumulative-max
    * sweep: a new span starts where an interval's start exceeds the
    * running max end of everything before it. Both window frames are
    * GROWING (`UNBOUNDED PRECEDING .. -1/CURRENT`), which Spark
    * evaluates incrementally — O(n) per user, never the O(n²)
    * re-aggregation a moving-start frame would plan. One shuffle on
    * user_id serves both windows and the final span aggregate. */
  def intervalMerge(spark: SparkSession, dir: String): DataFrame =
    intervalSpansOf(Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("value").isNotNull && col("event_id").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("s_us"),
        (unix_micros(col("ts")) +
          (abs(cents(col("value"))) % IvDurModulusS + IvDurFloorS) *
            lit(1000000L)).as("e_us")))

  /** The sweep itself over prepared `(user_id, event_id, s_us, e_us)`
    * rows — split out so property tests can drive it on generated
    * interval sets (OpsPropertySpec checks it against a sequential
    * merge). */
  def intervalSpansOf(iv: DataFrame): DataFrame = {
    val ord = Window.partitionBy("user_id")
      .orderBy(col("s_us"), col("e_us"), col("event_id"))
    iv.withColumn("prev_end",
        max(col("e_us")).over(ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_span",
        when(col("prev_end").isNull || col("s_us") > col("prev_end"), 1L)
          .otherwise(0L))
      .withColumn("span_id",
        sum(col("new_span"))
          .over(ord.rowsBetween(Window.unboundedPreceding, 0)).cast("int"))
      .groupBy("user_id", "span_id")
      .agg(min(col("s_us")).as("span_start_us"),
        max(col("e_us")).as("span_end_us"),
        count(lit(1)).as("n_events"))
      .withColumn("covered_us", col("span_end_us") - col("span_start_us"))
  }
}
