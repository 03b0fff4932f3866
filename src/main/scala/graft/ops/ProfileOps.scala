package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact._
import graft.sources.Tables

/** Data-profiling / data-quality operators (the Deequ-style validation
  * family a pipeline runs BEFORE training ever sees the data): per-column
  * profiles, value histograms, and robust outlier fences. Everything is
  * exact integer arithmetic over [[graft.functions.Exact]] units so the
  * whole family sits under the DuckDB hash gate.
  */
object ProfileOps {

  /** IN-FLIGHT metrics via `Dataset.observe` — the data-quality gate
    * that rides along a REAL pass instead of paying a second scan: the
    * production pattern is `df.observe(gate, …)` on the pipeline's own
    * write, then a listener (or `Observation.get`) checks the metrics
    * and fails the job on a null flood or row-count collapse. Here the
    * observed pipeline is a per-flag revenue rollup of `lineitem`
    * driven once through a noop write; the observation accumulates its
    * four metrics on the SAME task pass (an `AggregatingAccumulator`
    * riding the rows — zero extra jobs, zero extra scans; only the
    * 1-row metric struct crosses to the driver, same bound as any
    * 1-row aggregate). Returned table = the gate's metrics row, so the
    * DuckDB oracle re-derives exactly what the gate saw. */
  def observeGate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Observation
    val gate = Observation()
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey").isNotNull && col("l_extendedprice").isNotNull)
    val observed = li.observe(gate,
      count(lit(1)).as("n_rows"),
      sum(cents(col("l_extendedprice"))).as("price_cents"),
      sum(when(col("l_returnflag").isNull, 1L).otherwise(0L)).as("null_flags"),
      min(col("l_quantity").cast("long")).as("min_qty"))
    // the observed frame does the pipeline's real work exactly once;
    // metrics accumulate on this pass
    observed.groupBy("l_returnflag")
      .agg(sum(cents(col("l_extendedprice"))).as("rev_cents"))
      .write.format("noop").mode("overwrite").save()
    val row = gate.get
    import spark.implicits._
    Seq((row("n_rows").asInstanceOf[Long],
      row("price_cents").asInstanceOf[Long],
      row("null_flags").asInstanceOf[Long],
      row("min_qty").asInstanceOf[Long]))
      .toDF("n_rows", "price_cents", "null_flags", "min_qty")
  }

  /** Per-column profile of `orders` — row count, null count, distinct
    * count, min/max — the table a data-quality gate diffs run-over-run
    * to catch schema drift and null floods. Non-string columns are
    * profiled in their canonical exact unit (money → cents, timestamps
    * → epoch micros) and min/max are stringified AFTER the typed
    * aggregation, so ordering is native, never lexicographic.
    *
    * Scale shape: TWO bounded passes over the scan, split by buffer
    * type so each aggregates in the right operator. The exact distinct
    * counts plan as Expand (one duplicate of each input row per
    * distinct aggregate — the price of exactness; a 100 TB profile
    * would flip to approx_count_distinct) and, with only long count
    * buffers, stay a pure HashAggregate; the min/max/null fold runs
    * separately because a var-length (string) aggregation buffer
    * forces SortAggregate — fused with the Expand it would SORT the
    * 7×-expanded table (measured 3× slower), alone it is a sortless
    * 1-row fold. The two 1-row results cross-join and `stack` into the
    * per-column rows; the driver never sees data. */
  def dataProfile(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      cents(col("o_totalprice")).as("o_totalprice_c"),
      // o_orderdate is TIMESTAMP_NTZ; the UTC session makes the instant
      // cast lossless (same reinterpretation as Tables.events)
      unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
      col("o_orderpriority"))
    val cols = o.columns.toSeq
    val distinctAggs = cols.map(c => countDistinct(col(c)).as(s"nd_$c"))
    val foldAggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      min(col(c)).cast("string").as(s"mn_$c"),
      max(col(c)).cast("string").as(s"mx_$c"))) :+ count(lit(1)).as("n_rows")
    o.agg(foldAggs.head, foldAggs.tail: _*)
      .crossJoin(o.agg(distinctAggs.head, distinctAggs.tail: _*)) // 1 row × 1 row
      .select(expr(
        s"stack(${cols.length}, " + cols.map(c =>
          s"'$c', nn_$c, n_rows - nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ") +
          ") AS (col_name, n_nonnull, n_null, n_distinct, min_str, max_str)"))
  }

  /** Distribution-drift profile — the run-over-run monitoring a pipeline
    * diffs to catch schema rot and null floods BEFORE a bad batch trains:
    * the table splits at the integer midpoint of its time range (the
    * same `(min+max) div 2` discipline as the streaming harness — a
    * 1-row bounds aggregate rides along as a literal, nothing collects)
    * and ONE aggregation pass profiles every column per half; rows with
    * no timestamp land in the recent half. Emits per (column, half):
    * row/non-null/distinct counts and the null rate in per-mille — the
    * two-row-per-column table a drift alert thresholds.
    *
    * Same single-scan + `stack` shape as [[dataProfile]], with the same
    * documented Expand cost for exact distincts. */
  def driftProfile(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      cents(col("o_totalprice")).as("o_totalprice_c"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
      col("o_orderpriority"))
    val bounds = o.agg(
      expr("(min(o_orderdate_us) + max(o_orderdate_us)) div 2").as("split_us"))
    val halved = o.crossJoin(bounds)
      .withColumn("half",
        when(col("o_orderdate_us") <= col("split_us"), lit("a")).otherwise(lit("b")))
    val cols = o.columns.toSeq
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c"))) :+ count(lit(1)).as("n_rows")
    halved.groupBy("half").agg(aggs.head, aggs.tail: _*)
      .select(col("half"), expr(
        s"stack(${cols.length}, " + cols.map(c =>
          s"'$c', n_rows, nn_$c, nd_$c").mkString(", ") +
          ") AS (col_name, n_rows, n_nonnull, n_distinct)"))
      .withColumn("null_permille",
        idiv((col("n_rows") - col("n_nonnull")) * 1000, col("n_rows")))
  }

  /** Validation / QUARANTINE accounting — the dead-letter stage of a
    * load: each rule's violation count plus the count of fully-valid
    * rows, from ONE map-side-combinable aggregation pass (a row can
    * violate several rules and is counted under each; the quarantine
    * split itself is the same predicates as a filter). The 6-row output
    * is what a load-gate alerts on; at 100 TB it is one scan, no
    * shuffle beyond the single aggregate row. */
  def qualityQuarantine(spark: SparkSession, dir: String): DataFrame = {
    val rules: Seq[(String, Column)] = Seq(
      "null_ts" -> col("ts").isNull,
      "null_user" -> col("user_id").isNull,
      "null_value" -> col("value").isNull,
      "negative_value" -> (col("value") < 0),
      "null_type" -> col("event_type").isNull)
    val valid = rules.map { case (_, c) => !coalesce(c, lit(false)) }.reduce(_ && _)
    val aggs = rules.map { case (n, c) =>
      sum(when(coalesce(c, lit(false)), 1L).otherwise(0L)).as(n)
    } :+ sum(when(valid, 1L).otherwise(0L)).as("valid")
    val names = rules.map(_._1) :+ "valid"
    Tables.events(spark, dir)
      .agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${names.length}, " +
        names.map(n => s"'$n', $n").mkString(", ") + ") AS (rule, n)"))
  }

  /** Histogram bin width: $50k of order value in cents. */
  val HistBinCents = 5000000L

  /** Equi-width value histogram of order totals — the distribution
    * profile behind skew decisions (salting thresholds, partition
    * sizing) and drift monitoring. The bin key is a pure integer
    * division of exact cents, so the whole query is one map-side-
    * combinable hash aggregate on a derived key: scan-bound at 100 TB,
    * output bounded by the value range, never the row count. */
  def priceHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_totalprice").isNotNull)
      .select(cents(col("o_totalprice")).as("price_c"))
      .groupBy(idiv(col("price_c"), lit(HistBinCents)).as("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("price_c")).as("min_cents"),
        max(col("price_c")).as("max_cents"),
        sum(col("price_c")).as("sum_cents"))
      .withColumn("bin_lo_cents", col("bin") * HistBinCents)

  /** Robust outlier detection per event type: discrete quartiles (exact
    * rank picks, same no-lerp discipline as [[EventOps.percentiles]]),
    * Tukey fences at 1.5·IQR, and the kept/outlier split a feature
    * pipeline applies before normalization. The 1.5 factor stays in
    * integers by testing in HALF-cent units: keep iff
    * `2·q1 − 3·IQR ≤ 2·x ≤ 2·q3 + 3·IQR`.
    *
    * Scale shape: one exchange on event_type serves the rank window,
    * the quartile picks (max-over-partition windows on the same
    * partitioning), and the final aggregate — no self-join back onto
    * the events. */
  /** Bloom filter geometry: m bits, k hash functions. */
  val BloomBits = 1024
  val BloomHashes = 4

  /** Hash j's bit position for a key: the first 3 hex chars of
    * `md5("j:key")` mod [[BloomBits]] — reproducible nibble-for-nibble
    * in the oracle, unlike xxhash/murmur. */
  private def bloomPos(key: Column, j: Int): Column =
    conv(substring(md5(concat(lit(s"$j:"), key.cast("string"))), 1, 3), 16, 10)
      .cast("long") % BloomBits

  /** Bloom-filter build + probe — the fourth sketch family (after HLL,
    * GK and CMS) and the only one whose every bit is hard-oracled: each
    * nation's customer-key set builds an m=[[BloomBits]],
    * k=[[BloomHashes]] filter (md5-derived positions, so DuckDB
    * reconstructs the identical bitset), then the supplier keys of the
    * same nation probe it. Emits per nation: probe count, bloom hits,
    * exact true members, `n_missed` (members the bloom rejected — MUST
    * be 0, the no-false-negatives guarantee; a broken build/probe flips
    * it and fails the hash gate), set-bit count, and member count.
    *
    * Scale shape: the filter is a `collect_set` of bit positions whose
    * aggregation row is bounded by m (ints), NEVER by member count —
    * the point of a bloom; the filter table (groups × ≤m ints) then
    * BROADCASTS, so probing is map-side — the pre-join row-prune
    * pattern (Spark's own runtime bloom join is PlanSpec-pinned; this
    * is the explicit, persistable form a pipeline keys by tenant). */
  def bloomFilter(spark: SparkSession, dir: String): DataFrame = {
    val members = Tables.customer(spark, dir)
      .filter(col("c_custkey").isNotNull && col("c_nationkey").isNotNull)
      .select(col("c_nationkey").as("nationkey"), col("c_custkey").as("key"))
    val bloom = members
      .select(col("nationkey"), explode(array(
        (0 until BloomHashes).map(j => bloomPos(col("key"), j)): _*)).as("pos"))
      .groupBy("nationkey")
      .agg(sort_array(collect_set(col("pos"))).as("bloom"))
    val counts = members.groupBy("nationkey")
      .agg(countDistinct(col("key")).as("n_members"))
    val probes = Tables.supplier(spark, dir)
      .filter(col("s_suppkey").isNotNull && col("s_nationkey").isNotNull)
      .select(col("s_nationkey").as("nationkey"), col("s_suppkey").as("pkey"))
    val hit = (0 until BloomHashes)
      .map(j => array_contains(col("bloom"), bloomPos(col("pkey"), j)))
      .reduce(_ && _)
    val truth = members.distinct()
      .select(col("nationkey"), col("key").as("pkey"), lit(true).as("is_member"))
    probes
      .join(broadcast(bloom), Seq("nationkey"))
      .withColumn("hit", hit)
      .join(truth, Seq("nationkey", "pkey"), "left")
      .withColumn("member", coalesce(col("is_member"), lit(false)))
      .groupBy("nationkey")
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_bloom_hits"),
        sum(when(col("member"), 1L).otherwise(0L)).as("n_true_members"),
        sum(when(col("member") && !col("hit"), 1L).otherwise(0L)).as("n_missed"),
        max(size(col("bloom"))).cast("long").as("n_bits_set"))
      .join(broadcast(counts), "nationkey")
  }

  /** Per-group min-max feature normalization to integer per-mille — the
    * scaling pass a feature pipeline runs before training, kept exact:
    * `(x − min) · 1000 // (max − min)` over cents (a constant group
    * degenerates to 0). One exchange on event_type serves both extrema
    * windows and the projection — the same single-shuffle discipline as
    * [[iqrOutliers]]. */
  def minMaxNorm(spark: SparkSession, dir: String): DataFrame = {
    val part = Window.partitionBy("event_type")
    Tables.events(spark, dir)
      .filter(col("value").isNotNull && col("event_type").isNotNull &&
        col("event_id").isNotNull)
      .select(col("event_id"), col("event_type"), cents(col("value")).as("cents"))
      .withColumn("mn", min(col("cents")).over(part))
      .withColumn("mx", max(col("cents")).over(part))
      .withColumn("scaled_permille",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(idiv((col("cents") - col("mn")) * 1000, col("mx") - col("mn"))))
      .select("event_id", "event_type", "cents", "scaled_permille")
  }

  def iqrOutliers(spark: SparkSession, dir: String): DataFrame = {
    val part = Window.partitionBy("event_type")
    val w = part.orderBy(col("cents").asc)
    val ranked = Tables.events(spark, dir)
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), cents(col("value")).as("cents"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(part))
      .withColumn("q1",
        max(when(col("rn") === expr("(n-1) div 4") + 1, col("cents"))).over(part))
      .withColumn("q3",
        max(when(col("rn") === expr("((n-1)*3) div 4") + 1, col("cents"))).over(part))
    val iqr3 = (col("q3") - col("q1")) * 3
    val isOut = col("cents") * 2 < col("q1") * 2 - iqr3 ||
      col("cents") * 2 > col("q3") * 2 + iqr3
    ranked
      .groupBy(col("event_type"), col("q1").as("q1_cents"),
        col("q3").as("q3_cents"), col("n"))
      .agg(sum(when(isOut, 1L).otherwise(0L)).as("n_outliers"))
      .withColumn("n_kept", col("n") - col("n_outliers"))
  }

  /** Anonymity threshold for [[kAnonymity]]: a quasi-identifier group
    * smaller than this is suppressed. */
  val AnonK = 8

  /** K-anonymity suppression — the privacy gate a dataset passes before
    * release: rows are grouped by their quasi-identifier combination
    * (here nation × market segment on `customer`); any combination
    * shared by fewer than [[AnonK]] individuals is re-identifying, so
    * those rows emit with the quasi-identifiers SUPPRESSED (nulled) and
    * flagged. Every row also carries its equivalence-class size — the
    * k each individual actually enjoys in the released table.
    *
    * Scale shape: class sizes are a two-phase hash aggregate on the
    * quasi-identifier key; the size table is bounded by the QI DOMAIN
    * (|nations| × |segments|, not row count) so it broadcasts back onto
    * the table — the release pass is map-side, the corpus never
    * shuffles. At 100 TB with a high-cardinality QI the broadcast
    * flips to a shuffle join on the same key; nothing else changes. */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
    val classes = cust
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("class_size"))
    cust.join(broadcast(classes), Seq("c_nationkey", "c_mktsegment"))
      .select(
        col("c_custkey"),
        when(col("class_size") >= AnonK, col("c_nationkey"))
          .as("nation_q"),
        when(col("class_size") >= AnonK, col("c_mktsegment"))
          .as("segment_q"),
        (col("class_size") < AnonK).as("suppressed"),
        col("class_size"))
  }

  /** Order-independent dataset fingerprint — the integrity manifest a
    * 100 TB corpus publishes per snapshot: per source (plus a grand
    * total row), the row count and an XOR fold of each row's 60-bit
    * content hash, with min/max row hashes as a spot-check range. Two
    * snapshots are byte-identical iff their manifests match; a single
    * flipped row flips the XOR. The fold is COMMUTATIVE by design —
    * checksum(dataset) needs no global order, so the aggregate is a
    * plain two-phase hash agg that never sorts (an md5-of-concat
    * manifest would need a total sort of the corpus). Row content is
    * hashed over ALL columns with null sentinels, so null and empty
    * text hash differently. */
  def datasetChecksum(spark: SparkSession, dir: String): DataFrame = {
    val rowHash = expr(
      "CAST(conv(substr(md5(concat_ws('|', " +
        "coalesce(cast(doc_id AS string), '<null>'), " +
        "coalesce(text, '<null>'), " +
        "coalesce(lang, '<null>'), " +
        "coalesce(source, '<null>'), " +
        "coalesce(cast(n_chars AS string), '<null>'))), 1, 15), 16, 10) " +
        "AS BIGINT)")
    Tables.documents(spark, dir)
      .select(col("source"), rowHash.as("h"))
      .groupingSets(Seq(Seq(col("source")), Seq()), col("source"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("xor_fp"),
        min(col("h")).as("min_h"),
        max(col("h")).as("max_h"),
        // grouping() distinguishes the total row from a hypothetical
        // null source value — never trust the null itself
        expr("grouping(source)").as("g"))
      .withColumn("scope",
        when(col("g") === 1, lit("TOTAL")).otherwise(col("source")))
      .drop("source", "g")
  }
}
