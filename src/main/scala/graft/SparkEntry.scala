package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{EventOps, Relational, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is a named operator from SURVEY.md §2 (or a
  * north-star extension), implemented Spark-first in graft.ops.*; each
  * `oracleSql` entry is the DuckDB-equivalent over the same parquet
  * tables. Outputs follow the exact-arithmetic discipline in
  * [[graft.functions.Exact]] so value hashes match bit-for-bit.
  */
object SparkEntry {

  /** Flagship query (the reference's team_view replica,
    * `/root/reference/prefect/spark/fifa_spark.py:80-98`);
    * driver smoke-checks rows>0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Relational.teamView(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pricing_summary"  -> Relational.pricingSummary _,
    "q_latest_order"     -> Relational.latestOrderPerCustomer _,
    "q_argmax_joinback"  -> Relational.latestEventJoinBack _,
    "q_argmax_window"    -> Relational.latestEventWindow _,
    "q_canonical_name"   -> Relational.canonicalName _,
    "q_team_view"        -> Relational.teamView _,
    "q_filter_cast"      -> Relational.filterCastProject _,
    "q_join3"            -> Relational.joinThreeWay _,
    "q_broadcast_join"   -> Relational.broadcastDimJoin _,
    "q_semi_join"        -> Relational.semiJoin _,
    "q_anti_join"        -> Relational.antiJoin _,
    "q_topk_revenue"     -> Relational.topKRevenue _,
    "q_distinct_count"   -> Relational.distinctCount _,
    "q_rollup"           -> Relational.rollupRegionNation _,
    "q_set_ops"          -> Relational.setOps _,
    "q_running_total"    -> Relational.runningTotal _,
    "q_json_extract"     -> EventOps.jsonExtract _,
    "q_tumbling_hour"    -> EventOps.tumblingHour _,
    "q_sliding_hour"     -> EventOps.slidingHour _,
    "q_session_stats"    -> EventOps.sessionStats _,
    "q_token_stats"      -> TextOps.tokenStats _,
    "q_word_freq"        -> TextOps.wordFreq _,
    "q_lang_stats"       -> TextOps.langStats _,
    "q_fingerprint"      -> TextOps.fingerprint _,
    "q_quality_score"    -> TextOps.qualityScore _,
  )

  /** DuckDB-runnable ANSI SQL equivalents (same column names, same exact
    * integer arithmetic: cents = CAST(round(x*100) AS BIGINT), integral
    * division `//`). DuckDB SUM(BIGINT) returns HUGEINT, so every sum is
    * re-cast to BIGINT to match Spark's long. */
  def oracleSql: Map[String, String] = Map(
    "q_pricing_summary" ->
      """WITH t AS (SELECT l_returnflag, l_linestatus,
        |  CAST(round(l_quantity*100) AS BIGINT) AS qty_c,
        |  CAST(round(l_extendedprice*100) AS BIGINT) AS price_c,
        |  CAST(round(l_discount*100) AS BIGINT) AS disc_pct FROM lineitem)
        |SELECT l_returnflag, l_linestatus,
        |  CAST(sum(qty_c) AS BIGINT) AS sum_qty_cents,
        |  CAST(sum(price_c) AS BIGINT) AS sum_base_cents,
        |  CAST(sum(price_c*(100-disc_pct)) AS BIGINT) AS sum_disc_e4,
        |  max(price_c) AS max_price_cents,
        |  count(*) AS count_order,
        |  CAST(sum(qty_c)//count(*) AS BIGINT) AS avg_qty_cents,
        |  CAST(sum(price_c)//count(*) AS BIGINT) AS avg_price_cents
        |FROM t GROUP BY 1,2""".stripMargin,
    "q_latest_order" ->
      """SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS latest_odate,
        |  count(*) AS n_orders FROM orders GROUP BY 1""".stripMargin,
    "q_argmax_joinback" ->
      """WITH latest AS (SELECT user_id, max(ts) AS max_ts FROM events GROUP BY 1)
        |SELECT e.user_id, e.event_id, e.event_type, epoch_us(e.ts) AS ts_us,
        |  CAST(round(e.value*100) AS BIGINT) AS value_cents
        |FROM events e JOIN latest l ON e.user_id = l.user_id AND e.ts = l.max_ts""".stripMargin,
    "q_argmax_window" ->
      """SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "q_canonical_name" ->
      """SELECT c_nationkey, max(c_name) AS canonical_name,
        |  count(*) AS n_customers FROM customer GROUP BY 1""".stripMargin,
    "q_team_view" ->
      """WITH o AS (SELECT o_custkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_c,
        |    strftime(o_orderdate, '%Y-%m') AS order_month
        |  FROM orders WHERE o_custkey IS NOT NULL),
        |c AS (SELECT c_custkey, c_nationkey, CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_c
        |  FROM customer WHERE c_nationkey != 7)
        |SELECT order_month, n_name, r_name, n_name || ' - ' || r_name AS nation_region,
        |  CAST(sum(price_c) AS BIGINT) AS total_value_cents,
        |  CAST(sum(acctbal_c) AS BIGINT) AS total_bal_cents,
        |  max(price_c) AS best_order_cents,
        |  count(*) AS n_orders,
        |  CAST(sum(price_c)//count(*) AS BIGINT) AS avg_order_cents
        |FROM o JOIN c ON o.o_custkey = c.c_custkey
        |JOIN nation ON c.c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1,2,3,4""".stripMargin,
    "q_filter_cast" ->
      """SELECT CAST(c_custkey AS INTEGER) AS c_custkey, c_name,
        |  CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |  CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents, c_mktsegment
        |FROM customer WHERE c_nationkey != 7 AND c_name IS NOT NULL""".stripMargin,
    "q_join3" ->
      """WITH li AS (SELECT l_orderkey,
        |  CAST(round(l_extendedprice*100) AS BIGINT) AS price_c,
        |  CAST(round(l_discount*100) AS BIGINT) AS disc_pct FROM lineitem)
        |SELECT c_mktsegment,
        |  CAST(sum(price_c*(100-disc_pct)) AS BIGINT) AS revenue_e4,
        |  count(*) AS n_lineitems
        |FROM li JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey GROUP BY 1""".stripMargin,
    "q_broadcast_join" ->
      """SELECT r_name, count(*) AS n_customers,
        |  CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS total_bal_cents
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey GROUP BY 1""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q_topk_revenue" ->
      """SELECT o_custkey, revenue_cents FROM (
        |  SELECT o_custkey, CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1)
        |ORDER BY revenue_cents DESC, o_custkey LIMIT 10""".stripMargin,
    "q_distinct_count" ->
      """SELECT c_mktsegment, CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
        |  count(*) AS n_customers FROM customer GROUP BY 1""".stripMargin,
    "q_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin,
    "q_set_ops" ->
      """SELECT nationkey, 'customers_only' AS tag FROM (
        |  SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |  EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT nationkey, 'both' AS tag FROM (
        |  SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |  INTERSECT SELECT DISTINCT s_nationkey FROM supplier)""".stripMargin,
    "q_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
        |FROM orders""".stripMargin,
    "q_json_extract" ->
      """WITH e AS (SELECT event_type,
        |  CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k FROM events)
        |SELECT event_type, CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k,
        |  count(*) AS n FROM e GROUP BY 1""".stripMargin,
    "q_tumbling_hour" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1,2""".stripMargin,
    "q_sliding_hour" ->
      """WITH w AS (SELECT
        |  unnest([time_bucket(INTERVAL '30 minutes', ts),
        |          time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE]) AS s,
        |  event_type, CAST(round(value*100) AS BIGINT) AS v FROM events)
        |SELECT epoch_us(s) AS win_start_us, event_type, count(*) AS n,
        |  CAST(sum(v) AS BIGINT) AS value_cents
        |FROM w GROUP BY 1,2""".stripMargin,
    "q_session_stats" ->
      """WITH x AS (SELECT user_id, ts, event_id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (SELECT user_id, sum(new_s) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM x),
        |z AS (SELECT user_id, sid, count(*) AS n FROM y GROUP BY 1,2)
        |SELECT user_id, count(*) AS n_sessions, CAST(sum(n) AS BIGINT) AS n_events,
        |  max(n) AS max_session FROM z GROUP BY 1""".stripMargin,
    "q_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_uniq,
        |  CAST(CAST(len(list_distinct(string_split(text,' '))) AS BIGINT)*1000
        |       // CAST(len(string_split(text,' ')) AS BIGINT) AS BIGINT) AS ttr_permille
        |FROM documents""".stripMargin,
    "q_word_freq" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(text,' ')) AS word FROM documents)
        |GROUP BY 1 ORDER BY cnt DESC, word LIMIT 20""".stripMargin,
    "q_lang_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |  CAST(sum(n_chars)//count(*) AS BIGINT) AS avg_chars
        |FROM documents GROUP BY 1""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp, substr(md5(text),1,2) AS bucket
        |FROM documents""".stripMargin,
    "q_quality_score" ->
      """WITH t AS (SELECT doc_id, n_chars, string_split(text,' ') AS toks FROM documents),
        |u AS (SELECT doc_id, n_chars,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS tok_chars,
        |  CAST(len(list_filter(toks, x -> x IN ('the','a','data','row','value','fast'))) AS BIGINT) AS n_stop
        |  FROM t)
        |SELECT doc_id, n_tokens, tok_chars,
        |  CAST(tok_chars*1000//n_tokens AS BIGINT) AS mean_tok_len_e3,
        |  CAST(n_stop*1000//n_tokens AS BIGINT) AS stop_permille,
        |  n_chars < 100 AS is_short
        |FROM u""".stripMargin,
  )
}
