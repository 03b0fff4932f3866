package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact._
import graft.sources.Tables

/** The reference's relational surface (SURVEY.md §2), transplanted onto the
  * test star schema. Every operator here is declarative DataFrame API so
  * Catalyst plans it: partial aggregation, broadcast of small dims,
  * parquet filter pushdown and column pruning all come for free and
  * survive a 1000-executor scale-up.
  */
object Relational {

  /** A3/A4 analog (multi-aggregate GROUP BY) in TPC-H Q1 shape.
    * Maps `fifa_spark.py:80-98` (SUM/SUM/MAX/AVG-cast per group key).
    * All money flows as exact integer cents; the discounted price is an
    * exact integer in units of 1e-4 (cents × percent).
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_returnflag"), col("l_linestatus"),
        cents(col("l_quantity")).as("qty_c"),
        cents(col("l_extendedprice")).as("price_c"),
        pct(col("l_discount")).as("disc_pct"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("qty_c")).as("sum_qty_cents"),
        sum(col("price_c")).as("sum_base_cents"),
        sum(col("price_c") * (lit(100L) - col("disc_pct"))).as("sum_disc_e4"),
        max(col("price_c")).as("max_price_cents"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty_cents", idiv(col("sum_qty_cents"), col("count_order")))
      .withColumn("avg_price_cents", idiv(col("sum_base_cents"), col("count_order")))

  /** A1 argmax step 1: latest order date per customer
    * (`fifa_spark.py:34-39` — MAX(fifa_update) per fifa_version). */
  def latestOrderPerCustomer(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(
        max(col("o_orderdate").cast("date")).as("latest_odate"),
        count(lit(1)).as("n_orders"))

  /** A1+J1 argmax join-back: the reference's signature pattern
    * (`fifa_spark.py:34-52`) — latest event(s) per user. The per-user max
    * table is tiny relative to events, so Catalyst broadcasts it
    * (BroadcastHashJoin), exactly like `fifa_versions` in the reference.
    */
  def latestEventJoinBack(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val latest = ev.groupBy("user_id")
      .agg(max(col("ts")).as("max_ts"))
      .withColumnRenamed("user_id", "latest_user_id")
    ev.join(broadcast(latest),
        col("user_id") === col("latest_user_id") && col("ts") === col("max_ts"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"),
        cents(col("value")).as("value_cents"))
  }

  /** §2.5: the window-function equivalent of the argmax join-back —
    * `row_number() OVER (PARTITION BY user ORDER BY ts DESC, id DESC)`.
    * Deterministic tie-break on event_id so both engines agree.
    */
  def latestEventWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
  }

  /** A2 canonical-name pick (`fifa_spark.py:72-77`): group-max of a name
    * per key; the reference's redundant `DISTINCT(team_id)` collapses to a
    * plain GROUP BY. */
  def canonicalName(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy("c_nationkey")
      .agg(max(col("c_name")).as("canonical_name"),
        count(lit(1)).as("n_customers"))

  /** Flagship: the full team_view replica (`fifa_spark.py:80-98`) on the
    * star schema. Orders ⋈ customer ⋈ nation ⋈ region with:
    *   - P4 inequality filter (league_id != 78 → n_nationkey != 7)
    *   - P5 null-rejection (player_id IS NOT NULL → o_custkey IS NOT NULL)
    *   - F1 null-propagating CONCAT(league, ' - ', nation)
    *   - A3 SUM/SUM/MAX/MAX/AVG-cast×3 aggregate
    *   - A4 group on a 4-column key (raw columns, concat only displayed)
    * nation/region are tiny dims → explicit broadcast, so the only
    * shuffle is the final aggregation on the group key.
    */
  def teamView(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_custkey").isNotNull)
      .select(col("o_custkey"),
        cents(col("o_totalprice")).as("price_c"),
        date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
    val c = Tables.customer(spark, dir)
      .filter(col("c_nationkey") =!= 7)
      .select(col("c_custkey"), col("c_nationkey"),
        cents(col("c_acctbal")).as("acctbal_c"))
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .withColumn("nation_region",
        concat(col("n_name"), lit(" - "), col("r_name")))
      .groupBy(col("order_month"), col("n_name"), col("r_name"),
        col("nation_region"))
      .agg(
        sum(col("price_c")).as("total_value_cents"),
        sum(col("acctbal_c")).as("total_bal_cents"),
        max(col("price_c")).as("best_order_cents"),
        count(lit(1)).as("n_orders"))
      .withColumn("avg_order_cents", idiv(col("total_value_cents"), col("n_orders")))
  }

  /** P1/P2/P4/P5 in one: explicit projection, casts, inequality filter,
    * null rejection — the materialization SELECT of
    * `etl_kaggle_to_big_query.py:88-110` as a Spark projection. */
  def filterCastProject(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_nationkey") =!= 7 && col("c_name").isNotNull)
      .select(
        col("c_custkey").cast("int").as("c_custkey"),
        col("c_name"),
        col("c_nationkey").cast("long").as("c_nationkey"),
        cents(col("c_acctbal")).as("acctbal_cents"),
        col("c_mktsegment"))

  /** J3 analog: the big⋈big 3-way join — lineitem ⋈ orders ⋈ customer,
    * aggregated per market segment. lineitem⋈orders shuffles on orderkey
    * (sort-merge at scale); customer is the smaller side of the second
    * join. */
  def joinThreeWay(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), cents(col("l_extendedprice")).as("price_c"),
        pct(col("l_discount")).as("disc_pct"))
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        sum(col("price_c") * (lit(100L) - col("disc_pct"))).as("revenue_e4"),
        count(lit(1)).as("n_lineitems"))
  }

  /** J1/J2 analog with explicit broadcast of the tiny dims: customer ⋈
    * nation ⋈ region rolled up per region. */
  def broadcastDimJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_customers"),
        sum(cents(col("c_acctbal"))).as("total_bal_cents"))
  }

  /** SHUFFLED HASH JOIN — the third physical join algorithm next to
    * broadcast ([[broadcastDimJoin]]) and sort-merge (the default for
    * big⋈big, and the storage-partitioned q_spj_join): both sides
    * shuffle on the key, then each partition builds an in-memory hash
    * map of its SMALLER side and probes with the larger — no sort on
    * either side. The sweet spot at 100 TB is big ⋈ medium where the
    * medium side exceeds the broadcast threshold but one partition of
    * it fits in executor memory: SMJ would pay two full sorts purely to
    * merge, SHJ pays a per-partition build instead (the trade: an OOM
    * risk SMJ doesn't have, which is why Spark defaults to SMJ and
    * takes SHUFFLE_HASH as an explicit hint). lineitem ⋈ orders per
    * order-priority; PlanSpec pins the ShuffledHashJoin operator and
    * the absence of sorts. Oracle: the plain join. */
  def shuffleHashJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey").isNotNull)
      .select(col("l_orderkey"), cents(col("l_extendedprice")).as("price_c"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderkey").isNotNull && col("o_orderpriority").isNotNull)
      .select(col("o_orderkey"), col("o_orderpriority"))
    li.join(o.hint("shuffle_hash"), li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("price_c")).as("price_cents"))
  }

  /** Left-semi join (EXISTS): customers having at least one order. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_semi")
      .select("c_custkey", "c_mktsegment")
  }

  /** Left-anti join (NOT EXISTS): customers with no orders. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_nationkey")
  }

  /** §2.6 (absent in reference, required for completeness): deterministic
    * top-k — top 10 customers by exact revenue with key tie-break. */
  def topKRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), cents(col("l_extendedprice")).as("price_c"))
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(col("price_c")).as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("o_custkey").asc)
      .limit(10)
  }

  /** Top-k rows PER GROUP via the custom [[graft.functions.TopKPairs]]
    * TypedImperativeAggregate — the map-side-combining alternative to the
    * `row_number` window: each task reduces its slice to ≤ k pairs per
    * group before the exchange, so the shuffle carries O(groups × k)
    * rows, not O(orders) (PlanSpec pins the two-phase ObjectHashAggregate
    * and the absence of any Window). Exploded back to rows for the
    * driver compare; the oracle replays it as the window it replaces. */
  def topkAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_totalprice").isNotNull && col("o_orderkey").isNotNull)
      .select(col("o_custkey"), cents(col("o_totalprice")).as("price_c"),
        col("o_orderkey"))
    val c = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(graft.functions.TopKPairs.topkPairs(
        col("price_c"), col("o_orderkey"), 3).as("top"))
      .select(col("segment"), posexplode(col("top")).as(Seq("i", "p")))
      .select(col("segment"), (col("i") + 1).cast("integer").as("rank"),
        col("p.score").as("price_cents"), col("p.id").as("o_orderkey"))
  }

  /** Exact distinct aggregation (COUNT(DISTINCT)) per segment. */
  def distinctCount(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy("c_mktsegment")
      .agg(countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"))

  /** ROLLUP over the region→nation hierarchy (grouping-set family).
    * Expressed as temp views + spark.sql — the reference's own composition
    * style (`fifa_spark.py:27-99`) and a workaround for a
    * DetectAmbiguousSelfJoin false positive on DataFrame-API rollup (its
    * Expand duplicates attributes carrying __dataset_id metadata). */
  def rollupRegionNation(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("graft_customer")
    Tables.nation(spark, dir).createOrReplaceTempView("graft_nation")
    Tables.region(spark, dir).createOrReplaceTempView("graft_region")
    spark.sql(
      """SELECT r_name, n_name, count(*) AS n_customers
        |FROM graft_customer
        |JOIN graft_nation ON c_nationkey = n_nationkey
        |JOIN graft_region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin)
  }

  /** Explicit GROUPING SETS — the general form ROLLUP/CUBE specialize:
    * three grouping combinations in one pass, with `grouping_id` so a
    * NULL group key is distinguishable from NULL data. Temp-view SQL like
    * rollup/cube (the DataFrame grouping-sets API after joins trips
    * DetectAmbiguousSelfJoin). */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("graft_customer_gs")
    spark.sql(
      """SELECT c_mktsegment, c_nationkey, count(*) AS n,
        |  CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_cents,
        |  CAST(grouping_id(c_mktsegment, c_nationkey) AS BIGINT) AS gid
        |FROM graft_customer_gs
        |GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment), (c_nationkey))""".stripMargin)
  }

  /** String-function battery (the F-family breadth a SQL user expects):
    * case mapping, reverse, literal replace, translate, position, char
    * trim, repeat, pad, multi-arg concat — all codegen'd built-ins, one
    * narrow projection, no shuffle. */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        initcap(lower(col("c_mktsegment"))).as("seg_title"),
        reverse(col("c_name")).as("name_rev"),
        expr("replace(c_name, 'Customer#', 'C-')").as("name_short"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_tr"),
        instr(col("c_name"), "#").cast("long").as("hash_pos"),
        ltrim(substring(col("c_name"), 10, 100), "0").as("id_digits"),
        repeat(substring(col("c_mktsegment"), 1, 1), 3).as("seg3"),
        length(trim(col("c_name"))).cast("long").as("name_len"),
        lpad(ltrim(substring(col("c_name"), 10, 100), "0"), 6, "*").as("id_pad"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"))

  /** LATERAL correlated subquery with ORDER BY + LIMIT: top-2 customers
    * by balance PER NATION ROW — the per-row-subquery form of top-k that
    * Catalyst decorrelates into a join + per-group limit (vs the window
    * form in topKRevenue). Deterministic tie-break on custkey. */
  def lateralTopCustomers(spark: SparkSession, dir: String): DataFrame = {
    Tables.nation(spark, dir).createOrReplaceTempView("graft_nation_lat")
    Tables.customer(spark, dir).createOrReplaceTempView("graft_customer_lat")
    spark.sql(
      """SELECT n_name, t.c_custkey, t.acctbal_cents
        |FROM graft_nation_lat, LATERAL (
        |  SELECT c_custkey, CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents
        |  FROM graft_customer_lat WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""".stripMargin)
  }

  /** Set operations: nations that have customers but no suppliers
    * (EXCEPT) plus nations having both (INTERSECT), tagged. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val cn = Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey")).distinct()
    val sn = Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey")).distinct()
    val onlyCust = cn.except(sn).withColumn("tag", lit("customers_only"))
    val both = cn.intersect(sn).withColumn("tag", lit("both"))
    onlyCust.unionByName(both)
  }

  /** Full outer join: per-nation customer vs supplier counts, keys
    * surviving from either side via coalesce. */
  def outerJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").as("ck")).agg(count(lit(1)).as("n_cust"))
    val s = Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey").as("sk")).agg(count(lit(1)).as("n_supp"))
    c.join(s, col("ck") === col("sk"), "full_outer")
      .select(
        coalesce(col("ck"), col("sk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
  }

  /** Window-function breadth: lag/lead over the order sequence, dense_rank
    * and ntile over the price ranking — all with deterministic tie-breaks. */
  def windowFuncs(spark: SparkSession, dir: String): DataFrame = {
    val seq = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val byPrice = Window.partitionBy("o_custkey")
      .orderBy(col("price_c").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        cents(col("o_totalprice")).as("price_c"))
      .withColumn("prev_cents", lag(col("price_c"), 1).over(seq))
      .withColumn("next_cents", lead(col("price_c"), 1).over(seq))
      .withColumn("price_rank", dense_rank().over(byPrice))
      .withColumn("quartile", ntile(4).over(byPrice))
      .select("o_custkey", "o_orderkey", "price_c", "prev_cents",
        "next_cents", "price_rank", "quartile")
  }

  /** Correlated subqueries (temp views + SQL, like the reference): IN
    * subquery over a dim plus a correlated scalar MAX threshold. */
  def subqueries(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("graft_customer")
    Tables.supplier(spark, dir).createOrReplaceTempView("graft_supplier")
    Tables.nation(spark, dir).createOrReplaceTempView("graft_nation")
    spark.sql(
      """SELECT c_custkey, c_nationkey,
        |  CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents
        |FROM graft_customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM graft_nation WHERE n_regionkey = 2)
        |  AND CAST(round(c_acctbal*100) AS BIGINT) >
        |      (SELECT CAST(round(max(s_acctbal)*100) AS BIGINT)
        |       FROM graft_supplier WHERE s_nationkey = c_nationkey)""".stripMargin)
  }

  /** Scalar-function breadth over cross-engine-identical functions:
    * date parts, string ops, abs/greatest. */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        quarter(col("o_orderdate")).as("q"),
        dayofmonth(col("o_orderdate")).as("dom"),
        upper(col("o_orderpriority")).as("pri_upper"),
        substring(col("o_orderpriority"), 1, 1).as("pri1"),
        length(col("o_orderpriority")).cast("long").as("pri_len"),
        abs(cents(col("o_totalprice")) - 10000000L).as("dist_from_100k"),
        greatest(year(col("o_orderdate")), lit(1996)).as("y_floor"),
        lpad(col("o_orderkey").cast("string"), 12, "0").as("okey_pad"))

  /** Skew-resistant two-stage aggregation: salt the hot key space, do a
    * partial aggregate per (key, salt), then merge per key. Exact-integer
    * sums are associative, so the result equals the direct GROUP BY (the
    * oracle IS the direct form). At 100 TB this is the pattern for a key
    * whose group would otherwise overflow one task; locally AQE handles
    * mild skew, salting handles the pathological case. */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), cents(col("o_totalprice")).as("price_c"))
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .withColumn("salt", pmod(col("o_custkey"), lit(16)))
      .groupBy("c_nationkey", "salt")
      .agg(sum(col("price_c")).as("partial_cents"), count(lit(1)).as("partial_n"))
      .groupBy("c_nationkey")
      .agg(sum(col("partial_cents")).as("revenue_cents"),
        sum(col("partial_n")).as("n_orders"))
  }

  /** AQE SKEW-JOIN — the RUNTIME complement of [[saltedAgg]]'s manual
    * salting: a sort-merge join whose left shuffle is deliberately
    * skewed (a CASE collapses ~95% of events onto key 0), left to
    * Spark's `OptimizeSkewedJoin` to fix AT RUNTIME from the measured
    * partition sizes — the oversized partition is split into chunks and
    * the matching right rows replicated to each (no rewrite of the
    * query, no salt columns in user code). The child session pins the
    * demo at test scale: broadcast disabled (skew handling only applies
    * to shuffle joins) and the skew thresholds lowered to local-corpus
    * bytes; a 100 TB deployment keeps the defaults and gets the same
    * plan when a real key is hot. PlanSpec pins `skew=true` in the
    * final adaptive plan. Oracle: the same join+aggregate — runtime
    * re-planning must be value-invisible. */
  def skewJoin(parent: SparkSession, dir: String): DataFrame = {
    val spark = parent.newSession()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    // shuffle blocks are compressed: the hot partition is only a few KB
    // at the smallest test scale, so the demo thresholds sit at 2KB
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
    // the classic hot-customer shape: ~95% of events collapse onto
    // customer 1. Both join children are plain scans, so both sides get
    // ENSURE_REQUIREMENTS exchanges — the only shuffle origin
    // OptimizeSkewedJoin may re-split (an aggregate or user repartition
    // between scan and join would satisfy the join's distribution and
    // take the pattern out of the rule's reach)
    val s = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull && col("value").isNotNull)
      .select(
        when(col("user_id") % 20 =!= 0, lit(1L)).otherwise(col("user_id")).as("k"),
        col("event_type"), cents(col("value")).as("value_c"))
      // skew splits cut along MAPPER boundaries: the local corpus is one
      // parquet file = one map task, which makes the hot partition a
      // single indivisible chunk. Spread the fact side over 8 mappers —
      // exactly what a real multi-file 100 TB scan has for free.
      .repartition(8)
    val d = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    s.join(d, col("k") === col("c_custkey"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c_nationkey")).as("sum_nation"),
        sum(col("value_c")).as("value_cents"))
  }

  /** Promo revenue share per brand (TPC-H Q14 shape): lineitem ⋈ part
    * with conditional aggregation, all in exact e4 units (cents × pct)
    * and an integral per-mille ratio. The join hint is deliberately
    * absent: part is broadcastable at test SF and AQE picks BHJ; at
    * 100 TB part outgrows the broadcast threshold and the same plan
    * degrades gracefully to a shuffle join on p_partkey. */
  def promoShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        cents(col("l_extendedprice")).as("price_c"),
        pct(col("l_discount")).as("disc_pct"))
    val p = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_type")
    val promo = when(col("p_type") === "PROMO",
      col("price_c") * (lit(100L) - col("disc_pct"))).otherwise(lit(0L))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        sum(promo).as("promo_e4"),
        sum(col("price_c") * (lit(100L) - col("disc_pct"))).as("revenue_e4"),
        count(lit(1)).as("n_lineitems"))
      .withColumn("promo_permille", idiv(col("promo_e4") * 1000, col("revenue_e4")))
  }

  /** Slowly-changing-dimension type-2 history build — the batch CDC
    * step that turns an event log into a versioned dimension: each
    * customer's orders, ordered by time, become versioned rows with
    * `[valid_from, valid_to)` ranges (open-ended for the current one).
    * One window shuffle on the entity key; version, the closing
    * timestamp and the is_current flag are all `lead`/`row_number` over
    * the same partitioning, so the whole history build is a single
    * exchange regardless of table size. Records without an event time
    * cannot be versioned and are excluded (both engines). */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderpriority").as("pri"), col("o_orderdate"))
      // NTZ → session-UTC timestamp, same micros as the oracle's epoch_us
      .withColumn("ts", col("o_orderdate").cast("timestamp"))
      .withColumn("version", row_number().over(w).cast("int"))
      .withColumn("valid_from_us", unix_micros(col("ts")))
      .withColumn("valid_to_us", unix_micros(lead(col("ts"), 1).over(w)))
      .withColumn("is_current", col("valid_to_us").isNull)
      .select("o_custkey", "version", "o_orderkey", "pri",
        "valid_from_us", "valid_to_us", "is_current")
  }

  /** 2-d SKYLINE (Pareto frontier) of orders — the preference-query
    * family: every order not DOMINATED on (price, recency), i.e. no
    * other order is ≥ on both dims and > on at least one. Ties are
    * mutual non-dominators, so the emitted SET is deterministic.
    *
    * Scale shape — never the O(n²) dominance join, and never a
    * per-row re-aggregated window frame either (a `RANGE k FOLLOWING ..
    * ∞` max LOOKS declarative but WindowExec recomputes the aggregate
    * per row — O(n²), measured at 447 s on 150k rows): rows collapse to
    * per-price groups (hash aggregate), a plain GROWING-frame running
    * max over the descending distinct prices gives "max date among
    * strictly higher prices" incrementally in O(groups), and rows join
    * back on price to keep exactly those carrying their group's max
    * date and beating the higher-price max. Pass 1 applies that filter
    * WITHIN each input partition (local skylines; any subset's skyline
    * contains every global-skyline member in it, so pruning is safe) —
    * corpus-sized data sees only partition-local work. Pass 2
    * re-applies the same filter globally over the surviving frontier
    * candidates (frontier-sized, bounded). The oracle is the dominance
    * definition itself (NOT EXISTS). */
  /** The skyline core over any `(o_orderkey, price_cents, d_us)` set —
    * package-visible so the property spec can drive generated point
    * sets against a brute-force dominance reference. */
  private[graft] def skylineOf(base: DataFrame): DataFrame = {
    def frontier(df: DataFrame, part: Seq[String]): DataFrame = {
      val keys = part :+ "price_cents"
      val w = Window.partitionBy(part.map(col): _*)
        .orderBy(col("price_cents").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val groups = df.groupBy(keys.map(col): _*)
        .agg(max(col("d_us")).as("dmax"))
        // preceding rows in desc price order are exactly the strictly
        // higher price groups; growing frames accumulate incrementally
        .withColumn("mx_higher", max(col("dmax")).over(w))
      df.join(groups, keys)
        .filter(col("d_us") === col("dmax") &&
          (col("mx_higher").isNull || col("mx_higher") < col("d_us")))
        .drop("dmax", "mx_higher")
    }
    // partition-local prune (cheap, partition-invariant result) → tiny
    // global pass; spark_partition_id only steers pruning, never values
    val local = frontier(base.withColumn("pid", spark_partition_id()),
      Seq("pid")).drop("pid")
    frontier(local, Seq.empty)
      .select("o_orderkey", "price_cents", "d_us")
  }

  def skyline(spark: SparkSession, dir: String): DataFrame =
    skylineOf(Tables.orders(spark, dir)
      .filter(col("o_orderkey").isNotNull && col("o_totalprice").isNotNull &&
        col("o_orderdate").isNotNull)
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_cents"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("d_us")))

  /** Rank-function battery (percent_rank / cume_dist next to
    * q_window_funcs' lag/lead/dense_rank/ntile): relative standing of
    * every order within its priority class. Both metrics are ONE IEEE
    * division of exact integers — (rank−1)/(n−1) and peers/n — so they
    * are bit-identical across engines (the Exact discipline for emitted
    * doubles); ties share a value, making every row deterministic. One
    * shuffle on the partition key. */
  def rankFuncs(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy(col("cents").asc)
    Tables.orders(spark, dir)
      .filter(col("o_orderpriority").isNotNull && col("o_totalprice").isNotNull)
      .select(col("o_orderkey"), col("o_orderpriority"),
        cents(col("o_totalprice")).as("cents"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
  }

  /** Array-function battery over the token arrays (the collection
    * surface next to q_scalar_funcs / q_string_funcs): distinct size,
    * sorted prefix, membership, max token, stopword intersection — all
    * map-side expression work, zero shuffles. */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .withColumn("toks", array_sort(array_distinct(split(col("text"), " "))))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_distinct"),
        concat_ws(",", slice(col("toks"), 1, 3)).as("first3"),
        array_contains(col("toks"), "the").as("has_the"),
        element_at(col("toks"), -1).as("max_tok"),
        size(array_intersect(col("toks"),
          array(lit("the"), lit("a"), lit("of")))).cast("long").as("n_stop"))

  /** Running total per customer over order dates (window frame op). */
  def runningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        cents(col("o_totalprice")).as("price_c"))
      .withColumn("running_cents", sum(col("price_c")).over(w))
      .select("o_custkey", "o_orderkey", "running_cents")
  }
}
