package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ingest.Materialize
import graft.ops.{DedupOps, EventOps, MultimodalOps, ProfileOps, Relational, TextOps, VectorOps}

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
    * driver smoke-checks rows>0 on sf0.001. Takes the sf dir from the
    * same env var the other entry points use. */
  def entry(spark: SparkSession): DataFrame =
    Relational.teamView(spark,
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))

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
    "q_shuffle_hash_join" -> Relational.shuffleHashJoin _,
    "q_semi_join"        -> Relational.semiJoin _,
    "q_anti_join"        -> Relational.antiJoin _,
    "q_topk_revenue"     -> Relational.topKRevenue _,
    "q_topk_agg"         -> Relational.topkAgg _,
    "q_distinct_count"   -> Relational.distinctCount _,
    "q_rollup"           -> Relational.rollupRegionNation _,
    "q_set_ops"          -> Relational.setOps _,
    "q_running_total"    -> Relational.runningTotal _,
    "q_json_extract"     -> EventOps.jsonExtract _,
    "q_variant"          -> EventOps.variantExtract _,
    "q_recursive_cte"    -> EventOps.recursiveSessionWalk _,
    "q_sql_script"       -> EventOps.sqlScript _,
    "q_sql_params"       -> EventOps.sqlParams _,
    "q_sql_variables"    -> EventOps.sqlVariables _,
    "q_collation"        -> EventOps.collation _,
    "q_sql_udf"          -> EventOps.sqlUdf _,
    "q_tumbling_hour"    -> EventOps.tumblingHour _,
    "q_sliding_hour"     -> EventOps.slidingHour _,
    "q_session_stats"    -> EventOps.sessionStats _,
    "q_token_stats"      -> TextOps.tokenStats _,
    "q_word_freq"        -> TextOps.wordFreq _,
    "q_shingle_profile"  -> TextOps.shingleProfile _,
    "q_curriculum"       -> TextOps.curriculumOrder _,
    "q_lang_stats"       -> TextOps.langStats _,
    "q_fingerprint"      -> TextOps.fingerprint _,
    "q_quality_score"    -> TextOps.qualityScore _,
    "q_repetition"       -> TextOps.repetitionScore _,
    "q_dedup_exact"      -> DedupOps.dedupExact _,
    "q_dedup_clusters"   -> DedupOps.dedupClusters _,
    "q_minhash_lsh"      -> DedupOps.minhashLsh _,
    "q_ngram_jaccard"    -> DedupOps.ngramJaccard _,
    "q_simhash"          -> DedupOps.simhash _,
    "q_simhash_neardup"  -> DedupOps.simhashNearDup _,
    "q_knn_dot"          -> VectorOps.knnDot _,
    "q_cosine_knn"       -> VectorOps.cosineKnn _,
    // exact all-pairs embNearDup is a test-only recall yardstick (DedupSpec);
    // the shipped near-dup operator is the LSH-bucketed scale path:
    "q_emb_near_dup_lsh" -> VectorOps.embNearDupLsh _,
    "q_lsh_buckets"      -> VectorOps.lshBuckets _,
    "q_label_centroid"   -> VectorOps.labelCentroid _,
    "q_multimodal_meta"  -> MultimodalOps.mediaMeta _,
    "q_multimodal_thumb" -> MultimodalOps.mediaThumbs _,
    "q_phash_neardup"    -> MultimodalOps.phashNearDup _,
    "q_frame_sample"     -> MultimodalOps.frameSample _,
    "q_lang_id"          -> TextOps.langId _,
    "q_asof_join"        -> EventOps.asofLastOrder _,
    "q_approx_distinct"  -> EventOps.approxDistinct _,
    "q_approx_percentile" -> EventOps.approxPercentile _,
    "q_outer_join"       -> Relational.outerJoin _,
    "q_window_funcs"     -> Relational.windowFuncs _,
    "q_subqueries"       -> Relational.subqueries _,
    "q_scalar_funcs"     -> Relational.scalarFuncs _,
    "q_pivot"            -> EventOps.pivotEventCounts _,
    "q_cube"             -> EventOps.cubeEventDay _,
    "q_ann_lsh"          -> VectorOps.annLsh _,
    "q_ann_ivf"          -> VectorOps.annIvf _,
    "q_ann_pq"           -> VectorOps.annPq _,
    "q_salted_agg"       -> Relational.saltedAgg _,
    "q_skew_join"        -> Relational.skewJoin _,
    "q_regex_tokens"     -> TextOps.regexTokens _,
    "q_rolling_fp"       -> TextOps.rollingFingerprint _,
    "q_range_join"       -> EventOps.rangeJoinPairs _,
    "q_percentiles"      -> EventOps.percentiles _,
    "q_promo_share"      -> Relational.promoShare _,
    "q_materialize"      -> Materialize.playersFromMalformedCsv _,
    // executed by the Structured Streaming engine over a FILE SOURCE
    // (landing-zone parquet files → incremental triggers → memory sink;
    // no driver-side data path); oracles are batch SQL (stream ≡ batch)
    "q_stream_tumbling"  -> graft.streaming.StreamOps.tumblingHourStreamed _,
    "q_stream_session"   -> graft.streaming.StreamOps.sessionStreamed _,
    "q_stream_user_totals" -> graft.streaming.StreamOps.userTotalsStreamed _,
    "q_stream_tws"       -> graft.streaming.StreamOps.userTotalsTwsStreamed _,
    "q_stream_tws_ttl"   -> graft.streaming.StreamOps.userTotalsTwsTtlStreamed _,
    "q_stream_tws_init"  -> graft.streaming.StreamOps.userTotalsTwsInitStreamed _,
    "q_state_reader"     -> graft.streaming.StreamOps.stateReader _,
    "q_stream_timers"    -> graft.streaming.StreamOps.timerTotalsStreamed _,
    "q_stream_tws_map"   -> graft.streaming.StreamOps.typeCountsStreamed _,
    "q_stream_tws_list"  -> graft.streaming.StreamOps.recentEventsStreamed _,
    "q_stream_bursts"    -> graft.streaming.StreamOps.burstsStreamed _,
    "q_stream_dedup"     -> graft.streaming.StreamOps.dedupStreamed _,
    "q_stream_enrich"    -> graft.streaming.StreamOps.enrichStreamed _,
    "q_stream_ssjoin"    -> graft.streaming.StreamOps.intervalJoinStreamed _,
    "q_stream_sink"      -> graft.streaming.StreamOps.tumblingSinkStreamed _,
    "q_stream_dsv2_sink" -> graft.streaming.StreamOps.dsv2SinkStreamed _,
    "q_time_travel"      -> graft.streaming.StreamOps.timeTravel _,
    "q_incr_read"        -> graft.streaming.StreamOps.incrementalRead _,
    "q_stream_tail"      -> graft.streaming.StreamOps.streamTail _,
    "q_stream_upsert"    -> graft.streaming.StreamOps.upsertStreamed _,
    "q_stream_eq_upsert" -> graft.streaming.StreamOps.eqUpsertStreamed _,
    "q_stream_sliding"   -> graft.streaming.StreamOps.slidingStreamed _,
    "q_json_source"      -> Materialize.eventsFromJsonl _,
    "q_sample_stratified" -> TextOps.stratifiedSample _,
    "q_grouping_sets"    -> Relational.groupingSets _,
    "q_range_frame"      -> EventOps.trailingHourFrame _,
    "q_string_funcs"     -> Relational.stringFuncs _,
    "q_resample_hourly"  -> EventOps.resampleHourly _,
    "q_tfidf"            -> TextOps.tfIdf _,
    "q_json_map"         -> EventOps.jsonMap _,
    "q_bucketed_join"    -> Materialize.bucketedJoin _,
    "q_cbo_join"         -> Materialize.cboJoin _,
    "q_partitioned_write" -> Materialize.partitionedRoundTrip _,
    "q_dpp_join"         -> Materialize.dppJoin _,
    "q_lateral_topk"     -> Relational.lateralTopCustomers _,
    "q_unpivot"          -> EventOps.unpivotEventCounts _,
    "q_json_dropmalformed" -> Materialize.eventsFromCorruptJsonl _,
    "q_locf"             -> EventOps.locfValues _,
    "q_orc_roundtrip"    -> Materialize.orcRoundTrip _,
    "q_avro_roundtrip"   -> Materialize.avroRoundTrip _,
    "q_xml_roundtrip"    -> Materialize.xmlRoundTrip _,
    "q_heavy_hitters"    -> TextOps.heavyHitters _,
    "q_funnel"           -> EventOps.funnel _,
    "q_substring_dedup"  -> DedupOps.substringDedup _,
    "q_seq_pack"         -> TextOps.seqPack _,
    "q_inverted_index"   -> TextOps.invertedIndex _,
    "q_audio_meta"       -> MultimodalOps.audioMeta _,
    "q_audio_energy"     -> MultimodalOps.audioEnergy _,
    "q_fuzzy_match"      -> graft.ops.MatchOps.fuzzyMatch _,
    "q_scd2"             -> Relational.scd2 _,
    "q_zorder_box"       -> Materialize.zorderBox _,
    "q_triangles"        -> graft.ops.GraphOps.triangleCount _,
    "q_cdc_merge"        -> Materialize.cdcMerge _,
    "q_redact"           -> TextOps.redactNumbers _,
    "q_pagerank"         -> graft.ops.GraphOps.pageRank _,
    "q_bigram_next"      -> TextOps.bigramNext _,
    "q_group_sample"     -> TextOps.groupSample _,
    "q_dedup_survivors"  -> DedupOps.dedupSurvivors _,
    "q_cohort_retention" -> EventOps.cohortRetention _,
    "q_data_profile"     -> ProfileOps.dataProfile _,
    "q_histogram"        -> ProfileOps.priceHistogram _,
    "q_iqr_outliers"     -> ProfileOps.iqrOutliers _,
    "q_minmax_norm"      -> ProfileOps.minMaxNorm _,
    "q_bloom_filter"     -> ProfileOps.bloomFilter _,
    "q_drift_profile"    -> ProfileOps.driftProfile _,
    "q_vocab_coverage"   -> TextOps.vocabCoverage _,
    "q_lm_score"         -> TextOps.lmScore _,
    "q_decontam"         -> DedupOps.decontaminate _,
    "q_ewma"             -> EventOps.ewmaPerUser _,
    "q_transitions"      -> EventOps.transitionCounts _,
    "q_incr_agg"         -> Materialize.incrementalAggRefresh _,
    "q_compact_files"    -> Materialize.compactRoundTrip _,
    "q_stream_lojoin"    -> graft.streaming.StreamOps.leftOuterJoinStreamed _,
    "q_stream_fojoin"    -> graft.streaming.StreamOps.fullOuterJoinStreamed _,
    "q_schema_evolution" -> Materialize.schemaEvolution _,
    "q_retention_delete" -> Materialize.retentionDelete _,
    "q_sketch_union"     -> EventOps.sketchUnion _,
    "q_sketch_intersect" -> EventOps.sketchIntersect _,
    "q_skyline"          -> Relational.skyline _,
    "q_bfs"              -> graft.ops.GraphOps.bfsHops _,
    "q_quarantine"       -> ProfileOps.qualityQuarantine _,
    "q_train_split"      -> TextOps.trainSplit _,
    "q_stream_cascade"   -> graft.streaming.StreamOps.cascadeStreamed _,
    "q_stream_dsv2"      -> graft.streaming.StreamOps.dsv2Streamed _,
    "q_catalog_events"   -> Materialize.catalogEvents _,
    "q_rank_funcs"       -> Relational.rankFuncs _,
    "q_array_funcs"      -> Relational.arrayFuncs _,
    "q_interval_merge"   -> EventOps.intervalMerge _,
    "q_mix_rebalance"    -> TextOps.mixRebalance _,
    "q_semdedup"         -> VectorOps.semDedup _,
    "q_chunk_overlap"    -> TextOps.chunkOverlap _,
    "q_tokenize_ids"     -> TextOps.tokenizeIds _,
    "q_asof_exec"        -> EventOps.asofLastOrderExec _,
    "q_asof_sql"         -> EventOps.asofLastOrderSql _,
    "q_kanon"            -> ProfileOps.kAnonymity _,
    "q_dataset_checksum" -> ProfileOps.datasetChecksum _,
    "q_observe"          -> ProfileOps.observeGate _,
    "q_rendezvous_shard" -> Materialize.rendezvousShard _,
    "q_dsv2_scan"        -> Materialize.dsv2Scan _,
    "q_catalog_sql"      -> Materialize.catalogSql _,
    "q_dsv2_agg"         -> Materialize.dsv2Agg _,
    "q_dsv2_runtime_filter" -> Materialize.dsv2RuntimeFilter _,
    "q_dsv2_topn"        -> Materialize.dsv2TopN _,
    "q_dsv2_keyed_agg"   -> Materialize.dsv2KeyedAgg _,
    "q_spj_join"         -> Materialize.spjJoin _,
    "q_catalog_fn"       -> Materialize.catalogFunctions _,
    "q_dsv2_meta"        -> Materialize.dsv2Meta _,
    "q_dsv2_window"      -> Materialize.dsv2Window _,
    "q_meta_delete"      -> Materialize.metaDelete _,
    "q_variant_store"    -> Materialize.variantStore _,
    "q_dsv2_join_push"   -> Materialize.dsv2JoinPush _,
    "q_dsv2_stats"       -> Materialize.dsv2Stats _,
    "q_dsv2_sink"        -> Materialize.dsv2SinkRoundTrip _,
    "q_snap_skipping"    -> Materialize.snapSkippingRead _,
    "q_snap_skip_str"    -> Materialize.snapSkipString _,
    "q_snap_bloom_skip"  -> Materialize.snapBloomSkip _,
    "q_snap_array_evolve" -> Materialize.snapArrayEvolve _,
    "q_snap_map_evolve"  -> Materialize.snapMapEvolve _,
    "q_snap_skip_time"   -> Materialize.snapSkipTime _,
    "q_snap_evolution"   -> Materialize.snapEvolution _,
    "q_snap_delete"      -> Materialize.snapDelete _,
    "q_snap_update"      -> Materialize.snapUpdate _,
    "q_snap_merge"       -> Materialize.snapMerge _,
    "q_snap_overwrite"   -> Materialize.snapOverwrite _,
    "q_snap_ctas"        -> Materialize.snapCtas _,
    "q_snap_ddl"         -> Materialize.snapDdl _,
    "q_snap_files"       -> Materialize.snapFiles _,
    "q_snap_partitioned" -> Materialize.snapPartitioned _,
    "q_snap_spec_evolve" -> Materialize.snapSpecEvolve _,
    "q_snap_rollback"    -> Materialize.snapRollback _,
    "q_snap_widen"       -> Materialize.snapWiden _,
    "q_snap_tag"         -> Materialize.snapTag _,
    "q_snap_partitions"  -> Materialize.snapPartitions _,
    "q_snap_ts_travel"   -> Materialize.snapTsTravel _,
    "q_snap_cdf"         -> Materialize.snapCdf _,
    "q_snap_cdf_merge"   -> Materialize.snapCdfMerge _,
    "q_snap_cdf_cow_pair" -> Materialize.snapCdfCowPair _,
    "q_snap_cdf_incr"    -> Materialize.snapCdfIncr _,
    "q_snap_cdf_stream"  -> Materialize.snapCdfStream _,
    "q_snap_cdf_ts"      -> Materialize.snapCdfTs _,
    "q_snap_nested_evolve" -> Materialize.snapNestedEvolve _,
    "q_snap_branch"      -> Materialize.snapBranch _,
    "q_snap_branch_mor"  -> Materialize.snapBranchMor _,
    "q_snap_branch_overwrite" -> Materialize.snapBranchOverwrite _,
    "q_snap_ndv"         -> Materialize.snapNdv _,
    "q_snap_branch_stream" -> Materialize.snapBranchStream _,
    "q_snap_expire"      -> Materialize.snapExpire _,
    "q_snap_dv_delete"   -> Materialize.snapDvDelete _,
    "q_snap_dv_update"   -> Materialize.snapDvUpdate _,
    "q_snap_dv_merge"    -> Materialize.snapDvMerge _,
    "q_snap_rename"      -> Materialize.snapRename _,
    "q_snap_checkpoint"  -> Materialize.snapCheckpoint _,
    "q_snap_colmap"      -> Materialize.snapColmap _,
    "q_snap_history"     -> Materialize.snapHistory _,
    "q_snap_cor"         -> Materialize.snapCor _,
    "q_snap_compact"     -> Materialize.snapCompact _,
    "q_vacuum_sql"       -> Materialize.vacuumSql _,
    "q_incr_dedup"       -> DedupOps.incrementalDedup _,
    "q_snapshot_diff"    -> Materialize.snapshotDiff _,
    "q_bpe_merges"       -> TextOps.bpeMerges _,
  )

  /** DuckDB oracle for q_bpe_merges: [[TextOps.BpeRounds]] unrolled
    * rounds — pair counts from the weighted vocabulary, argmax with the
    * (cnt DESC, a, b) tie-break, greedy merge via `list_reduce` (the
    * same fold semantics as the Spark `aggregate` HOF). */
  private def bpeOracle: String = {
    val rounds = (1 to TextOps.BpeRounds).map { r =>
      s"""p$r AS (SELECT u.a AS a, u.b AS b, CAST(sum(c) AS BIGINT) AS cnt
        |  FROM s${r - 1}, unnest(CASE WHEN len(s) >= 2
        |    THEN [{'a': s[i], 'b': s[i + 1]} for i in generate_series(1, len(s) - 1)]
        |    ELSE [] END) AS t(u)
        |  GROUP BY 1, 2),
        |b$r AS (SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
        |s$r AS (SELECT c, list_reduce(list_transform(s, x -> [x]),
        |    (acc, x) -> CASE WHEN acc[-1] = b$r.a AND x[1] = b$r.b
        |      THEN list_concat(acc[1:len(acc) - 1], [b$r.a || b$r.b])
        |      ELSE list_concat(acc, x) END) AS s
        |  FROM s${r - 1}, b$r)""".stripMargin
    }.mkString(",\n")
    val rows = (1 to TextOps.BpeRounds).map { r =>
      s"""SELECT CAST($r AS INTEGER) AS round, b$r.a AS lhs, b$r.b AS rhs,
        |  b$r.cnt AS pair_count,
        |  (SELECT CAST(sum(c * len(s)) AS BIGINT) FROM s$r) AS symbols_after
        |FROM b$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH w AS (SELECT word, count(*) AS c FROM (
      |    SELECT unnest(string_split(text, ' ')) AS word
      |    FROM documents WHERE text IS NOT NULL)
      |  WHERE length(word) > 0 GROUP BY 1),
      |s0 AS (SELECT c,
      |  [substr(word, i, 1) for i in generate_series(1, length(word))] AS s
      |  FROM w),
      |$rounds
      |$rows""".stripMargin
  }

  /** The query set narrowed to `names` (None = all), with unknown names
    * rejected loudly — shared by Verify's arg filter and Bench's
    * SPARK_GRAFT_BENCH_ONLY so the two subset mechanisms can't drift. */
  def subset(names: Option[Set[String]], source: String): Seq[(String, (SparkSession, String) => DataFrame)] = {
    names.foreach { ns =>
      val unknown = ns -- queries.keySet
      require(unknown.isEmpty, s"$source names unknown queries: ${unknown.mkString(",")}")
    }
    queries.toSeq.sortBy(_._1).filter { case (n, _) => names.forall(_.contains(n)) }
  }

  /** Shared CTE block for the minhash-family oracles: ends at `j`
    * (candidate pairs with exact intersection/union counts). */
  private val MinhashCtes: String =
    """toks AS (SELECT doc_id, list_distinct(string_split(text,' ')) AS t FROM documents),
      |sets AS (SELECT doc_id, list_distinct(list_transform(t, x -> substr(md5(x),1,15))) AS s FROM toks),
      |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
      |mh AS (SELECT doc_id, h, min(substr(md5(h || ':' || tok),1,15)) AS mh
      |  FROM tok CROSS JOIN (SELECT unnest(generate_series(0,15)) AS h) AS hs(h) GROUP BY 1,2),
      |band AS (SELECT doc_id, h//4 AS band,
      |  string_agg(h || ':' || mh, '|' ORDER BY h) AS band_sig FROM mh GROUP BY 1,2),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM band a JOIN band b ON a.band=b.band AND a.band_sig=b.band_sig AND a.doc_id < b.doc_id),
      |j AS (SELECT doc_a, doc_b,
      |  CAST(len(list_intersect(x.s,y.s)) AS BIGINT) AS inter,
      |  CAST(len(list_distinct(list_concat(x.s,y.s))) AS BIGINT) AS uni
      |  FROM cand JOIN sets x ON doc_a=x.doc_id JOIN sets y ON doc_b=y.doc_id)""".stripMargin

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
    "q_shuffle_hash_join" -> // the join ALGORITHM is a physical choice
      // only — values must equal the plain join
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS price_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_orderkey IS NOT NULL AND o_orderkey IS NOT NULL
        |  AND o_orderpriority IS NOT NULL
        |GROUP BY 1""".stripMargin,
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
    "q_topk_agg" -> // the window the TopKPairs aggregate replaces: same
      // (score DESC, id ASC) order, same k, same null-key exclusions
      """SELECT segment, CAST(rn AS INTEGER) AS rank, price_cents, o_orderkey
        |FROM (SELECT c_mktsegment AS segment,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS price_cents, o_orderkey,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC, o_orderkey)
        |      AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE o_totalprice IS NOT NULL AND o_orderkey IS NOT NULL)
        |WHERE rn <= 3""".stripMargin,
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
    "q_grouping_sets" ->
      """SELECT c_mktsegment, c_nationkey, count(*) AS n,
        |  CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_cents,
        |  CAST(grouping(c_mktsegment, c_nationkey) AS BIGINT) AS gid
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment), (c_nationkey))""".stripMargin,
    "q_range_frame" -> // RANGE frame over epoch seconds; floor on both sides
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  count(*) OVER w AS n_1h,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) OVER w AS BIGINT) AS cents_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)//1000000
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_string_funcs" -> // initcap emulated: segments are single words
      """SELECT c_custkey,
        |  upper(substr(lower(c_mktsegment),1,1)) || substr(lower(c_mktsegment),2) AS seg_title,
        |  reverse(c_name) AS name_rev,
        |  replace(c_name, 'Customer#', 'C-') AS name_short,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
        |  CAST(instr(c_name, '#') AS BIGINT) AS hash_pos,
        |  ltrim(substr(c_name, 10, 100), '0') AS id_digits,
        |  repeat(substr(c_mktsegment, 1, 1), 3) AS seg3,
        |  CAST(length(trim(c_name)) AS BIGINT) AS name_len,
        |  lpad(ltrim(substr(c_name, 10, 100), '0'), 6, '*') AS id_pad,
        |  concat_ws('|', c_mktsegment, c_name) AS joined
        |FROM customer""".stripMargin,
    "q_resample_hourly" ->
      """WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo,
        |    date_trunc('hour', max(ts)) AS hi FROM events),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b),
        |ty AS (SELECT DISTINCT event_type FROM events),
        |c AS (SELECT date_trunc('hour', ts) AS chour, event_type AS ctype, count(*) AS n
        |  FROM events GROUP BY 1,2)
        |SELECT epoch_us(spine.hour) AS hour_us, ty.event_type,
        |  CAST(coalesce(n, 0) AS BIGINT) AS n
        |FROM spine CROSS JOIN ty
        |LEFT JOIN c ON c.chour = spine.hour AND c.ctype = ty.event_type""".stripMargin,
    "q_running_total" ->
      // NULLS FIRST: Spark ASC sorts nulls first, DuckDB defaults last
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
        |FROM orders""".stripMargin,
    "q_json_extract" ->
      """WITH e AS (SELECT event_type,
        |  CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k FROM events)
        |SELECT event_type, CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k,
        |  count(*) AS n FROM e GROUP BY 1""".stripMargin,
    "q_sql_udf" -> // the SQL-function bodies inlined by hand — function
      // abstraction must be value-invisible
      """WITH totals AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1
        |  HAVING sum(CAST(round(value * 100) AS BIGINT)) >= 200000)
        |SELECT user_id, total_cents,
        |  CASE WHEN total_cents % 10000 < 2500 THEN 'low'
        |       WHEN total_cents % 10000 < 7500 THEN 'mid'
        |       ELSE 'high' END AS cents_bucket
        |FROM totals""".stripMargin,
    "q_collation" -> // case-insensitive collation grouping must equal
      // the manual lower() normalization it replaces
      """WITH mixed AS (
        |  SELECT CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END
        |      AS lang_mixed,
        |    n_chars
        |  FROM documents
        |  WHERE lang IS NOT NULL AND doc_id IS NOT NULL
        |    AND n_chars IS NOT NULL)
        |SELECT lower(lang_mixed) AS lang, count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(CASE WHEN lower(lang_mixed) = 'en' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_en
        |FROM mixed
        |GROUP BY 1""".stripMargin,
    "q_sql_variables" -> // the variable-chosen column and threshold
      // inline — session state must be value-invisible
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS metric_cents
        |FROM lineitem
        |WHERE l_quantity >= 25.0 AND l_returnflag IS NOT NULL
        |GROUP BY 1""".stripMargin,
    "q_sql_params" -> // the bound parameters inline as literals — the
      // parameterized plan must equal the hand-written query
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM orders
        |WHERE o_orderstatus = 'O' AND o_totalprice > 1000.0
        |  AND o_orderpriority IS NOT NULL
        |GROUP BY 1""".stripMargin,
    "q_sql_script" -> // the script's variable inlines as a scalar
      // subquery; the block's result is its last statement's result
      """WITH top AS (SELECT c_mktsegment AS seg FROM customer
        |  WHERE c_mktsegment IS NOT NULL
        |  GROUP BY 1 ORDER BY count(*) DESC, c_mktsegment LIMIT 1)
        |SELECT n_name, count(*) AS n_cust,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |    AS acctbal_cents
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_mktsegment = (SELECT seg FROM top)
        |  AND c_acctbal IS NOT NULL
        |GROUP BY 1""".stripMargin,
    "q_recursive_cte" -> // the identical linear recursion in DuckDB —
      // session heads anchor, next-within-30min links extend, depth
      // caps at 50 in both engines
      """WITH RECURSIVE e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    LEAD(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_id,
        |    LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts_us,
        |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts_us
        |  FROM events
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
        |  CAST(max(depth) AS BIGINT) AS max_depth
        |FROM walk GROUP BY 1, 2""".stripMargin,
    "q_variant" -> // typed VARIANT path extraction ≡ DuckDB JSON extraction
      // over the same strings; the absent path must be NULL (0 hits)
      """WITH e AS (SELECT event_type,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |  CAST(json_extract(props, '$.missing') AS BIGINT) AS m
        |  FROM events WHERE props IS NOT NULL)
        |SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k, count(m) AS n_miss_hits
        |FROM e GROUP BY 1""".stripMargin,
    "q_json_map" -> // k reproduces Spark's non-ANSI string→long EXACTLY
      // (pinned in ExpressionSpec): integral strings parse exactly at any
      // int64 magnitude (a DOUBLE round-trip would corrupt >2^53),
      // decimals truncate at the dot ('.5'→0), exponent/Infinity/
      // overflow/garbage → NULL — and the oracle can never hard-error on
      // a driver-regenerated corpus (TRY_CAST throughout)
      // Spark's numeric-string parse skips ALL leading/trailing bytes
      // <= 0x20 (not just spaces) — the oracle trims the same 33 chars
      { val ws = (0 to 32).map(i => s"chr($i)").mkString("||")
      s"""WITH e AS (SELECT event_id, props,
        |    trim(props->>'k', $ws) AS ks,
        |    list_extract(string_split(trim(props->>'k', $ws), '.'), 1) AS ki
        |  FROM events WHERE props IS NOT NULL)
        |SELECT event_id,
        |  array_to_string(list_sort(json_keys(props)), ',') AS keys,
        |  CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
        |  CASE WHEN regexp_matches(ks, '^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)$$')
        |       THEN COALESCE(TRY_CAST(ki AS BIGINT),
        |                     CASE WHEN ki IN ('', '+', '-') THEN 0 END)
        |       END AS k
        |FROM e""".stripMargin },
    "q_locf" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  CAST(round(value*100) AS BIGINT) AS value_cents,
        |  CAST(last_value(CAST(round(value*100) AS BIGINT) IGNORE NULLS) OVER w AS BIGINT) AS locf_cents,
        |  CAST(first_value(CAST(round(value*100) AS BIGINT) IGNORE NULLS) OVER w AS BIGINT) AS first_cents
        |FROM events WHERE ts IS NOT NULL
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id NULLS FIRST
        |  ROWS UNBOUNDED PRECEDING)""".stripMargin,
    "q_tumbling_hour" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events WHERE ts IS NOT NULL GROUP BY 1,2""".stripMargin,
    "q_stream_tumbling" -> // batch q_tumbling_hour SQL (stream ≡ batch) over
      // COMPLETE events: the typed stream rejects null key/time/value fields
      """SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events
        |WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |  AND user_id IS NOT NULL AND value IS NOT NULL
        |GROUP BY 1,2""".stripMargin,
    "q_stream_sink" -> // append-mode parquet-sink content ≡ the batch
      // tumbling SQL (exactly-once emission into the sink's commit log)
      """SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events
        |WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |  AND user_id IS NOT NULL AND value IS NOT NULL
        |GROUP BY 1,2""".stripMargin,
    "q_stream_dsv2_sink" -> // DSv2 streaming sink: the union of per-epoch
      // manifest commits ≡ the input projection, row for row (exactly-once
      // append through the atomic epoch-manifest publish)
      """SELECT event_id, user_id, event_type FROM events
        |WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |  AND user_id IS NOT NULL AND value IS NOT NULL
        |  AND event_type IS NOT NULL""".stripMargin,
    "q_time_travel" -> // VERSION AS OF 2 over the 4-epoch manifest log,
      // where epoch i carries exactly the event_id%4=i slice — so the
      // historical snapshot IS the residue-prefix of the append log
      """SELECT event_type, count(*) AS n,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum
        |FROM events
        |WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |  AND user_id IS NOT NULL AND value IS NOT NULL
        |  AND event_type IS NOT NULL AND event_id % 4 <= 2
        |GROUP BY event_type""".stripMargin,
    "q_incr_read" -> // epochs (1, 3] of the same log — the incremental
      // (CDC) window is exactly the event_id%4 IN (2,3) residue slices
      """SELECT event_type, count(*) AS n,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum
        |FROM events
        |WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |  AND user_id IS NOT NULL AND value IS NOT NULL
        |  AND event_type IS NOT NULL AND event_id % 4 IN (2, 3)
        |GROUP BY event_type""".stripMargin,
    "q_stream_tail" -> // tailing the whole 4-epoch log == the batch view
      // of every complete event (streaming write -> log -> streaming read)
      """SELECT event_type, count(*) AS n,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum
        |FROM events
        |WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |  AND user_id IS NOT NULL AND value IS NOT NULL
        |  AND event_type IS NOT NULL
        |GROUP BY event_type""".stripMargin,
    "q_stream_user_totals" -> // final mapGroupsWithState state per user ==
      // the batch per-user totals over complete events (stream ≡ batch)
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM events
        |WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |  AND user_id IS NOT NULL AND value IS NOT NULL
        |GROUP BY 1""".stripMargin,
    "q_state_reader" -> // the state store's key set after an unwatermarked
      // streaming dedup IS the distinct-id set (state content ≡ the
      // semantic the operator maintains)
      """SELECT DISTINCT event_id FROM events
        |WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |  AND user_id IS NOT NULL AND value IS NOT NULL""".stripMargin,
    "q_stream_tws_list" -> // ListState last-3 buffer; the final snapshot
      // per user ≡ the batch rank-3 pivot (top-3 merge is closed under
      // batching: an evicted pair can never re-enter the true top 3)
      """WITH e AS (SELECT user_id, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS r,
        |    count(*) OVER (PARTITION BY user_id) AS n_seen
        |  FROM events
        |  WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |    AND user_id IS NOT NULL AND value IS NOT NULL)
        |SELECT user_id, CAST(max(n_seen) AS BIGINT) AS n_seen,
        |  max(CASE WHEN r = 1 THEN event_id END) AS id1,
        |  max(CASE WHEN r = 2 THEN event_id END) AS id2,
        |  max(CASE WHEN r = 3 THEN event_id END) AS id3
        |FROM e GROUP BY 1""".stripMargin,
    "q_stream_tws_map" -> // MapState per-user type counts; counts only
      // grow, so max over the Update-mode emissions is the final table
      """SELECT user_id, event_type, count(*) AS n
        |FROM events
        |WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |  AND user_id IS NOT NULL AND value IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,
    "q_stream_timers" -> // inactivity-timer flush emits each user's totals
      // exactly once; the emitted set ≡ the batch per-user totals
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM events
        |WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |  AND user_id IS NOT NULL AND value IS NOT NULL
        |GROUP BY 1""".stripMargin,
    "q_stream_tws" -> // transformWithState (the mapGroupsWithState
      // successor, RocksDB-backed): same per-user fold, same oracle —
      // the API migration must be result-invisible
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM events
        |WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |  AND user_id IS NOT NULL AND value IS NOT NULL
        |GROUP BY 1""".stripMargin,
    "q_stream_tws_ttl" -> // TTL'd ValueState (processing-time eviction,
      // the unbounded-key answer): TTL ≫ run length, so nothing expires
      // mid-run and totals match the un-TTL'd oracle; real eviction is
      // wall-clock and pinned in StreamingSpec via the statestore reader
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM events
        |WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |  AND user_id IS NOT NULL AND value IS NOT NULL
        |GROUP BY 1""".stripMargin,
    "q_stream_tws_init" -> // warm-start migration: batch snapshot of
      // half 1 as initial state + streamed half 2; final state content
      // must equal the FULL-corpus totals (migration is
      // result-invisible, so the oracle is q_stream_tws's)
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM events
        |WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |  AND user_id IS NOT NULL AND value IS NOT NULL
        |GROUP BY 1""".stripMargin,
    "q_stream_upsert" -> // the final upsert-table version == the batch
      // per-user totals (the exactly-once MERGE guarantee)
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM events
        |WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |  AND user_id IS NOT NULL AND value IS NOT NULL
        |GROUP BY 1""".stripMargin,
    "q_stream_eq_upsert" -> // IDENTICAL oracle to q_stream_upsert: the
      // equality-delete sink (delete-by-key + append per micro-batch,
      // target never read) must be value-invisible vs the foreachBatch
      // MERGE — and the post-compaction resolution too (pinned in-query)
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM events
        |WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |  AND user_id IS NOT NULL AND value IS NOT NULL
        |GROUP BY 1""".stripMargin,
    "q_stream_bursts" -> // flatMapGroupsWithState closes a user's batch-1
      // burst iff the user has batch-2 activity; the harness splits at the
      // integer midpoint of the corpus time range, reproduced here with the
      // same (min+max)//2 arithmetic (both engines truncate)
      """WITH c AS (SELECT user_id, ts FROM events
        |  WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |    AND user_id IS NOT NULL AND value IS NOT NULL),
        |s AS (SELECT (epoch_us(min(ts)) + epoch_us(max(ts)))//2 AS split_us FROM c),
        |b1 AS (SELECT user_id, ts FROM c, s WHERE epoch_us(ts) <= split_us),
        |b2 AS (SELECT DISTINCT user_id FROM c, s WHERE epoch_us(ts) > split_us)
        |SELECT b1.user_id, count(*) AS n_events,
        |  epoch_us(min(b1.ts)) AS first_us, epoch_us(max(b1.ts)) AS last_us
        |FROM b1 JOIN b2 ON b1.user_id = b2.user_id
        |GROUP BY 1""".stripMargin,
    "q_stream_enrich" -> // stream-static join + window ≡ batch join+window
      """SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us, n_name,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events
        |JOIN customer ON user_id = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |  AND user_id IS NOT NULL AND value IS NOT NULL
        |GROUP BY 1,2""".stripMargin,
    "q_stream_ssjoin" -> // stream-stream interval join ≡ the batch
      // self-join with the same predicate (inner join emits exactly the
      // matched pairs; watermarks only bound state)
      """SELECT c.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
        |  epoch_us(p.ts) AS p_ts_us, epoch_us(c.ts) AS c_ts_us
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
        |WHERE c.event_id IS NOT NULL AND c.ts IS NOT NULL
        |  AND c.user_id IS NOT NULL AND c.value IS NOT NULL
        |  AND p.event_id IS NOT NULL AND p.ts IS NOT NULL
        |  AND p.user_id IS NOT NULL AND p.value IS NOT NULL""".stripMargin,
    "q_stream_sliding" -> // sliding windows streamed ≡ the batch unnest form
      """WITH w AS (SELECT
        |  unnest([time_bucket(INTERVAL '30 minutes', ts),
        |          time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE]) AS s,
        |  event_type, CAST(round(value*100) AS BIGINT) AS v FROM events
        |  WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |    AND user_id IS NOT NULL AND value IS NOT NULL)
        |SELECT epoch_us(s) AS win_start_us, event_type, count(*) AS n,
        |  CAST(sum(v) AS BIGINT) AS value_cents
        |FROM w GROUP BY 1,2""".stripMargin,
    "q_stream_dedup" -> // streaming dedup under redelivery emits each id
      // exactly once; the id SET is the deterministic contract (the row
      // picked among duplicates is arbitrary by definition)
      """SELECT DISTINCT event_id FROM events
        |WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |  AND user_id IS NOT NULL AND value IS NOT NULL""".stripMargin,
    "q_stream_session" -> // per-session rows; same gaps-and-islands family as
      // q_session_stats, over COMPLETE events (typed-stream contract)
      """WITH x AS (SELECT user_id, ts, event_id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |    AND user_id IS NOT NULL AND value IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (SELECT user_id, ts, sum(new_s) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM x)
        |SELECT epoch_us(min(ts)) AS sess_start_us, user_id, count(*) AS n
        |FROM y GROUP BY user_id, sid""".stripMargin,
    "q_json_source" ->
      s"""SELECT id, kind, CAST(round(amount*100) AS BIGINT) AS amount_cents,
        |  CAST(len(tags) AS BIGINT) AS n_tags, meta.k AS meta_k, meta.source AS meta_source
        |FROM read_json('${Materialize.EventsJsonl}', format='newline_delimited',
        |  columns={id:'BIGINT', kind:'VARCHAR', amount:'DOUBLE', tags:'VARCHAR[]',
        |           meta:'STRUCT(k BIGINT, source VARCHAR)'})""".stripMargin,
    // Spark DROPMALFORMED drops the corrupt line, DuckDB ignore_errors
    // nulls it; the shared null-id filter reconciles the two policies
    "q_json_dropmalformed" ->
      s"""SELECT id, kind, CAST(round(amount*100) AS BIGINT) AS amount_cents,
        |  CAST(len(tags) AS BIGINT) AS n_tags, meta.k AS meta_k, meta.source AS meta_source
        |FROM read_json('${Materialize.EventsCorruptJsonl}', format='newline_delimited',
        |  ignore_errors=true,
        |  columns={id:'BIGINT', kind:'VARCHAR', amount:'DOUBLE', tags:'VARCHAR[]',
        |           meta:'STRUCT(k BIGINT, source VARCHAR)'})
        |WHERE id IS NOT NULL""".stripMargin,
    "q_sliding_hour" ->
      """WITH w AS (SELECT
        |  unnest([time_bucket(INTERVAL '30 minutes', ts),
        |          time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE]) AS s,
        |  event_type, CAST(round(value*100) AS BIGINT) AS v FROM events
        |  WHERE ts IS NOT NULL)
        |SELECT epoch_us(s) AS win_start_us, event_type, count(*) AS n,
        |  CAST(sum(v) AS BIGINT) AS value_cents
        |FROM w GROUP BY 1,2""".stripMargin,
    "q_session_stats" ->
      """WITH x AS (SELECT user_id, ts, event_id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS new_s
        |  FROM events WHERE ts IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
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
        |FROM documents WHERE text IS NOT NULL""".stripMargin,
    "q_word_freq" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(text,' ')) AS word FROM documents)
        |GROUP BY 1 ORDER BY cnt DESC, word LIMIT 20""".stripMargin,
    "q_curriculum" -> // the window the two-pass range-sort ranking
      // replaces; same token banding (split keeps empty tokens in both
      // engines), 0-based position
      s"""SELECT doc_id, CAST(band AS INTEGER) AS band,
        |  CAST(row_number() OVER (ORDER BY band, doc_id) - 1 AS BIGINT)
        |    AS position
        |FROM (SELECT doc_id,
        |    least(len(string_split(text, ' ')) // ${TextOps.CurriculumBandTokens},
        |      ${TextOps.CurriculumMaxBand}) AS band
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL)""".stripMargin,
    "q_shingle_profile" -> // same half-overlapping 8-char windows the
      // ShingleGen generator streams (substr is 1-based; pos is 0-based
      // codepoints — the corpus character set makes them agree)
      s"""WITH sh AS (SELECT lang,
        |    substr(text, p + 1, ${TextOps.ShingleK}) AS shingle
        |  FROM documents,
        |    unnest(generate_series(0, length(text) - ${TextOps.ShingleK},
        |      ${TextOps.ShingleStep})) AS g(p)
        |  WHERE text IS NOT NULL AND lang IS NOT NULL),
        |c AS (SELECT lang, shingle, count(*) AS cnt FROM sh GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang
        |    ORDER BY cnt DESC, shingle) AS rn FROM c)
        |SELECT lang, CAST(rn AS INTEGER) AS rank, shingle,
        |  CAST(cnt AS BIGINT) AS cnt
        |FROM r WHERE rn <= ${TextOps.ShingleTopN}""".stripMargin,
    "q_heavy_hitters" -> // exact top-20 + the CMS guarantee holding
      // (estimate never below truth, at most eps*N above) — the sketch
      // side is Spark's; the oracle recomputes the exact side and
      // asserts within_bound TRUE, same pattern as the HLL/GK rows
      """SELECT word, cnt, TRUE AS within_bound FROM (
        |  SELECT word, count(*) AS cnt FROM (
        |    SELECT unnest(string_split(text,' ')) AS word
        |    FROM documents WHERE text IS NOT NULL)
        |  GROUP BY 1 ORDER BY cnt DESC, word LIMIT 20)""".stripMargin,
    "q_funnel" -> // view → click → purchase stage minima per user;
      // 'at or after' is >= on exact epoch-µs, deterministic throughout
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |v AS (SELECT user_id, min(us) AS view_us FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.us) AS click_us FROM e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.us >= v.view_us GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.us) AS purchase_us FROM e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.us >= c.click_us GROUP BY 1)
        |SELECT v.user_id, view_us, click_us, purchase_us
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |LEFT JOIN p ON v.user_id = p.user_id""".stripMargin,
    "q_xml_roundtrip" -> // oracle is the plain SQL over the ORIGINAL
      // table — the XML write + read-back must be value-invisible
      """SELECT n_regionkey, count(*) AS n_nations,
        |  min(n_name) AS first_nation,
        |  CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        |FROM nation
        |GROUP BY 1""".stripMargin,
    "q_avro_roundtrip" -> // oracle is the plain SQL over the ORIGINAL
      // table — the avro write + read-back must be value-invisible
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY 1""".stripMargin,
    "q_orc_roundtrip" -> // oracle is the plain SQL over the ORIGINAL
      // table — the ORC write + read-back must be value-invisible
      """SELECT l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_cents,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_cents,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |FROM lineitem WHERE l_linestatus = 'F'
        |GROUP BY 1""".stripMargin,
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
        |  FROM t WHERE toks IS NOT NULL)
        |SELECT doc_id, n_tokens, tok_chars,
        |  CAST(tok_chars*1000//n_tokens AS BIGINT) AS mean_tok_len_e3,
        |  CAST(n_stop*1000//n_tokens AS BIGINT) AS stop_permille,
        |  n_chars < 100 AS is_short
        |FROM u""".stripMargin,
    "q_repetition" -> // Gopher-style repetition signals: integer per-mille
      // of repeated tokens / duplicated trigrams; keep = below both bounds
      """WITH d AS (SELECT doc_id, string_split(text,' ') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |x AS (SELECT doc_id,
        |  CAST(len(t) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
        |  [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |   for i in generate_series(1, len(t)-2)] AS tri
        |  FROM d),
        |y AS (SELECT doc_id, n_tokens,
        |  CAST((n_tokens - n_distinct)*1000 // greatest(n_tokens, 1) AS BIGINT) AS dup_token_permille,
        |  CAST(len(tri) AS BIGINT) AS n_tri,
        |  CAST(len(tri) - len(list_distinct(tri)) AS BIGINT) AS n_dup_tri
        |  FROM x)
        |SELECT doc_id, n_tokens, dup_token_permille, n_tri, n_dup_tri,
        |  CAST(n_dup_tri*1000 // greatest(n_tri, 1) AS BIGINT) AS dup_tri_permille,
        |  (n_dup_tri*1000 // greatest(n_tri, 1)) <= 300
        |    AND dup_token_permille <= 700 AS keep
        |FROM y""".stripMargin,
    "q_sample_stratified" ->
      s"""SELECT doc_id, lang, source, substr(md5(lang || ':' || doc_id), 1, 2) AS bucket
        |FROM documents
        |WHERE lang IS NOT NULL
        |  AND substr(md5(lang || ':' || doc_id), 1, 2) <
        |  CASE WHEN lang = 'en' THEN '${TextOps.EnThreshold}' ELSE '${TextOps.DefaultThreshold}' END""".stripMargin,
    "q_tfidf" -> // log-free rational tf-idf: tf*N*1000 // df, exact ints
      """WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS term FROM d) GROUP BY 1,2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM d),
        |s AS (SELECT doc_id, tf.term, tf, df,
        |  CAST(tf*n_docs*1000 // df AS BIGINT) AS tfidf_e3
        |  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (
        |  PARTITION BY doc_id ORDER BY tfidf_e3 DESC, term) AS rank FROM s)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        |  tfidf_e3, CAST(rank AS INTEGER) AS rank
        |FROM r WHERE rank <= 3""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text,' '))),' ')) AS content_key,
        |  count(*) AS n_docs, min(doc_id) AS canonical_doc
        |FROM documents WHERE text IS NOT NULL GROUP BY 1""".stripMargin,
    "q_minhash_lsh" ->
      s"""WITH $MinhashCtes
        |SELECT doc_a, doc_b, CAST(inter AS DOUBLE)/uni AS jaccard
        |FROM j WHERE inter*10 >= uni*8""".stripMargin,
    // closure of the same pair graph; min reachable doc_id per node — the
    // recursive CTE is order-free, exactly like Spark's min-label loop
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $MinhashCtes,
        |pairs AS (SELECT doc_a, doc_b FROM j WHERE inter*10 >= uni*8),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |nodes AS (SELECT doc_id FROM documents WHERE text IS NOT NULL),
        |reach AS (
        |  SELECT doc_id, doc_id AS r FROM nodes
        |  UNION
        |  SELECT e.b AS doc_id, reach.r FROM reach JOIN edges e ON reach.doc_id = e.a
        |)
        |SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY 1""".stripMargin,
    "q_ngram_jaccard" ->
      // the size-band blocking key (bit length of the shingle count) and
      // the adjacent-band probe are part of the operator contract: pairs
      // ≥2 bands apart have size ratio ≥2 hence jaccard ≤ 0.5 and are
      // dropped by construction — the oracle reproduces the band join
      """WITH sh0 AS (SELECT doc_id, lang, source,
        |  list_distinct(list_transform(
        |    [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |     for i in generate_series(1, len(t)-2)],
        |    x -> substr(md5(x),1,15))) AS sh
        |  FROM (SELECT doc_id, lang, source, string_split(text,' ') AS t FROM documents)),
        |sh AS (SELECT *, length(bin(CAST(len(sh) AS BIGINT))) AS band FROM sh0),
        |p AS (SELECT a.lang, a.source,
        |  least(a.doc_id, b.doc_id) AS doc_a, greatest(a.doc_id, b.doc_id) AS doc_b,
        |  CAST(len(list_intersect(a.sh,b.sh)) AS BIGINT) AS inter,
        |  CAST(len(list_distinct(list_concat(a.sh,b.sh))) AS BIGINT) AS uni
        |  FROM sh a JOIN sh b ON a.lang=b.lang AND a.source=b.source
        |    AND (b.band = a.band + 1 OR (b.band = a.band AND a.doc_id < b.doc_id)))
        |SELECT lang, source, doc_a, doc_b, CAST(inter AS DOUBLE)/uni AS jaccard
        |FROM p WHERE inter > 0""".stripMargin,
    "q_simhash_neardup" -> { // SCALE-AWARE banded simhash near-dup: band
      // width bb = bitLength(corpus size) clamped to [4,15] (bucket space
      // 2^bb >= n keeps random bucket population O(1) — the r10 ladder
      // showed fixed 4-bit bands densify 4.87x on 3x data); 4 bands
      // ALWAYS, so the pigeonhole hamming<=3 guarantee holds at every
      // scale. The oracle derives the same bb via length(bin(count(*)))
      // (integer-exact both engines) and masks a 60-bit vote table down
      // to the live 4*bb hash bits.
      def nib(c: Int) = s"(strpos('0123456789abcdef', substr(md5(tok), ${c + 1}, 1))-1)"
      def vote(b: Int) = s"((((${nib(b / 4)} >> ${3 - b % 4}) % 2) * 2) - 1)"
      val sums = (0 until 60).map(b => s"CAST(sum(${vote(b)}) AS BIGINT) AS s$b").mkString(", ")
      val bucket = (0 until 60).map(b =>
        s"(CASE WHEN $b < 4*bb AND s$b >= 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
      val msk = "((CAST(1 AS BIGINT) << bb) - 1)"
      val firstBand = s"CASE WHEN (x & $msk) = 0 THEN 0 WHEN ((x >> bb) & $msk) = 0 THEN 1" +
        s" WHEN ((x >> (2*bb)) & $msk) = 0 THEN 2 ELSE 3 END"
      s"""WITH nb AS (SELECT GREATEST(4, LEAST(15, length(bin(count(*))))) AS bb FROM documents),
         |tok AS (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS tok FROM documents),
         |agg AS (SELECT doc_id, $sums FROM tok GROUP BY doc_id),
         |sh AS (SELECT doc_id, CAST($bucket AS BIGINT) AS simhash FROM agg CROSS JOIN nb),
         |k AS (SELECT doc_id, simhash, band, (simhash >> (band*bb)) & $msk AS bits
         |  FROM sh CROSS JOIN nb CROSS JOIN (SELECT unnest(generate_series(0,3)) AS band)),
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.band,
         |    xor(a.simhash, b.simhash) AS x
         |  FROM k a JOIN k b ON a.band = b.band AND a.bits = b.bits AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(x) AS INTEGER) AS hamming
         |FROM p CROSS JOIN nb WHERE band = ($firstBand) AND bit_count(x) <= ${DedupOps.SimhashMaxHamming}""".stripMargin
    },
    "q_simhash" -> {
      def nib(c: Int) = s"(strpos('0123456789abcdef', substr(md5(tok), ${c + 1}, 1))-1)"
      def vote(b: Int) = s"((((${nib(b / 4)} >> ${3 - b % 4}) % 2) * 2) - 1)"
      val sums = (0 until 16).map(b => s"CAST(sum(${vote(b)}) AS BIGINT) AS s$b").mkString(", ")
      val bucket = (0 until 16).map(b => s"(CASE WHEN s$b >= 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
      s"""WITH tok AS (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS tok FROM documents),
         |agg AS (SELECT doc_id, $sums FROM tok GROUP BY doc_id)
         |SELECT doc_id, CAST($bucket AS BIGINT) AS simhash FROM agg""".stripMargin
    },
    "q_knn_dot" ->
      """WITH q AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv FROM embeddings),
        |p AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
        |  CAST(list_sum(list_transform(generate_series(1,len(a.qv)), i -> a.qv[i]*b.qv[i])) AS BIGINT) AS dot
        |  FROM q a JOIN q b ON a.vec_id < 16 AND a.vec_id != b.vec_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, cand_id) AS rank FROM p)
        |SELECT query_id, cand_id, CAST(rank AS INTEGER) AS rank, dot FROM r WHERE rank <= 5""".stripMargin,
    "q_cosine_knn" ->
      """WITH q AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv FROM embeddings),
        |n AS (SELECT vec_id, qv, CAST(list_sum(list_transform(qv, x->x*x)) AS BIGINT) AS nrm FROM q),
        |p AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
        |  CAST(list_sum(list_transform(generate_series(1,len(a.qv)), i -> a.qv[i]*b.qv[i])) AS BIGINT)
        |    / sqrt(CAST(a.nrm*b.nrm AS DOUBLE)) AS cos
        |  FROM n a JOIN n b ON a.vec_id < 16 AND a.vec_id != b.vec_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank FROM p)
        |SELECT query_id, cand_id, CAST(rank AS INTEGER) AS rank, cos FROM r WHERE rank <= 5""".stripMargin,
    // Spark dedups multi-table collisions via first-matching-table (no
    // distinct shuffle); the oracle's DISTINCT yields the same pair SET.
    "q_emb_near_dup_lsh" -> {
      val k = VectorOps.NearDupPlanes
      val nPlanes = VectorOps.NearDupTables * VectorOps.NearDupPlanes
      s"""WITH w AS (SELECT p, list_transform(generate_series(0,63),
        |    i -> CASE WHEN strpos('89abcdef', substr(md5(p || ':' || i),1,1)) > 0 THEN 1 ELSE -1 END) AS wv
        |  FROM (SELECT unnest(generate_series(0,${nPlanes - 1})) AS p)),
        |q AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv FROM embeddings),
        |n AS (SELECT vec_id, qv, CAST(list_sum(list_transform(qv, x->x*x)) AS BIGINT) AS nrm FROM q),
        |s AS (SELECT vec_id, p, CAST(list_sum(list_transform(generate_series(1,64),
        |    i -> wv[i]*qv[i])) AS BIGINT) AS sp FROM q CROSS JOIN w),
        |bb AS (SELECT vec_id, p//$k AS tbl,
        |    CAST(sum(CASE WHEN sp >= 0 THEN (1<<(p%$k)) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM s GROUP BY 1,2),
        |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM bb a JOIN bb b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
        |p AS (SELECT vec_a, vec_b,
        |  CAST(list_sum(list_transform(generate_series(1,len(x.qv)), i -> x.qv[i]*y.qv[i])) AS BIGINT)
        |    / sqrt(CAST(x.nrm*y.nrm AS DOUBLE)) AS cos
        |  FROM cand JOIN n x ON vec_a = x.vec_id JOIN n y ON vec_b = y.vec_id)
        |SELECT vec_a, vec_b, cos FROM p WHERE cos >= ${VectorOps.NearDupCos}""".stripMargin
    },
    "q_lsh_buckets" ->
      """WITH w AS (SELECT p, list_transform(generate_series(0,63),
        |    i -> CASE WHEN strpos('89abcdef', substr(md5(p || ':' || i),1,1)) > 0 THEN 1 ELSE -1 END) AS wv
        |  FROM (SELECT unnest(generate_series(0,7)) AS p)),
        |q AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv FROM embeddings),
        |s AS (SELECT vec_id, p, CAST(list_sum(list_transform(generate_series(1,64),
        |    i -> wv[i]*qv[i])) AS BIGINT) AS sp FROM q CROSS JOIN w),
        |b AS (SELECT vec_id, CAST(sum(CASE WHEN sp >= 0 THEN (1<<p) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM s GROUP BY 1)
        |SELECT bucket, count(*) AS n_vecs FROM b GROUP BY 1""".stripMargin,
    "q_label_centroid" ->
      """WITH q AS (SELECT label, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv FROM embeddings),
        |e AS (SELECT label, CAST(generate_subscripts(qv,1)-1 AS INTEGER) AS pos, unnest(qv) AS v FROM q)
        |SELECT label, pos, CAST(sum(v) AS BIGINT) AS sum_q, count(*) AS n,
        |  CAST(sum(v) AS DOUBLE)/count(*) AS centroid_e3
        |FROM e GROUP BY 1,2""".stripMargin,
    "q_multimodal_thumb" -> // geometry of the genuine Graphics2D resize:
      // source dims from the encode formulas, thumb = floor-half (min 1)
      """SELECT doc_id,
        |  CAST(1 + octet_length(encode(text)) % 64 AS INTEGER) AS width,
        |  CAST(1 + (octet_length(encode(text)) // 64) % 64 AS INTEGER) AS height,
        |  CAST(greatest(1, (1 + octet_length(encode(text)) % 64) // 2) AS INTEGER) AS thumb_w,
        |  CAST(greatest(1, (1 + (octet_length(encode(text)) // 64) % 64) // 2) AS INTEGER) AS thumb_h
        |FROM documents WHERE text IS NOT NULL""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(1 + octet_length(encode(text)) % 64 AS INTEGER) AS width,
        |  CAST(1 + (octet_length(encode(text)) // 64) % 64 AS INTEGER) AS height,
        |  CAST(1 + octet_length(encode(text)) % 8 AS INTEGER) AS frames
        |FROM documents WHERE text IS NOT NULL""".stripMargin,
    "q_phash_neardup" -> // recompute the 8×8 aHash from the encode
      // formulas: pixel (y,x) of the PNG is source byte (y·w+x) mod n,
      // and the corpus is pure ASCII (verified: octet_length == length
      // at every sf), so ord(substr) IS the byte. The banded Spark plan
      // is exact for hamming <= 7 by pigeonhole (8 bands), so the
      // oracle is the plain all-pairs filter. Bit 63 can't be built as
      // 1<<63 in DuckDB (overflow) — its set-value is the min-BIGINT
      // literal, identical to Spark's 1L<<63 wrap.
      """WITH g AS (SELECT doc_id, text,
        |    octet_length(encode(text)) AS n,
        |    1 + octet_length(encode(text)) % 64 AS w,
        |    1 + (octet_length(encode(text)) // 64) % 64 AS h
        |  FROM documents WHERE text IS NOT NULL),
        |s AS (SELECT doc_id, i,
        |    CASE WHEN n = 0 THEN 0
        |         ELSE ord(substr(text, ((((i//8) * h) // 8) * w + (((i%8) * w) // 8)) % n + 1, 1))
        |    END AS v
        |  FROM g, (SELECT unnest(generate_series(0,63)) AS i) AS gi(i)),
        |m AS (SELECT doc_id, CAST(sum(v) AS BIGINT) // 64 AS mean FROM s GROUP BY 1),
        |hsh AS (SELECT s.doc_id,
        |    bit_or(CASE WHEN v >= mean THEN
        |        CASE WHEN i = 63 THEN -9223372036854775808 ELSE 1::BIGINT << i END
        |      ELSE 0 END) AS phash
        |  FROM s JOIN m ON s.doc_id = m.doc_id GROUP BY 1)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
        |FROM hsh a JOIN hsh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.phash, b.phash)) <= 7""".stripMargin,
    "q_pagerank" -> { // unrolled integer-fixpoint iterations: rank' =
      // 150000 + (85·Σ(rank//deg))//100, bit-identical to the Spark loop
      val scale = graft.ops.GraphOps.PrScale
      def iter(prev: String, out: String) =
        s"""$out AS (SELECT s.dst AS v,
           |  CAST(${15 * scale / 100} + (85 * CAST(sum(r.rank // d.deg) AS BIGINT)) // 100 AS BIGINT) AS rank
           |  FROM sym s JOIN $prev r ON s.src = r.v JOIN deg d ON s.src = d.src
           |  GROUP BY 1)""".stripMargin
      val rounds = (1 to graft.ops.GraphOps.PrIters)
        .map(t => iter(s"r${t - 1}", s"r$t")).mkString(",\n")
      s"""WITH pp AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
        |e0 AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  JOIN pp x ON a.l_partkey = x.p_partkey
        |  JOIN pp y ON b.l_partkey = y.p_partkey),
        |sym AS (SELECT a AS src, b AS dst FROM e0
        |  UNION ALL SELECT b, a FROM e0),
        |deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY 1),
        |r0 AS (SELECT src AS v, CAST($scale AS BIGINT) AS rank FROM deg),
        |$rounds
        |SELECT v AS p_partkey, rank AS rank_e6
        |FROM r${graft.ops.GraphOps.PrIters}""".stripMargin
    },
    "q_bigram_next" -> // adjacent-pair counts + per-context top-3 next
      // words; tokens never contain spaces, so the pair round-trips
      // through a space-joined string
      s"""WITH d AS (SELECT string_split(text,' ') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |p AS (SELECT split_part(pr, ' ', 1) AS w1, split_part(pr, ' ', 2) AS w2
        |  FROM (SELECT unnest([t[i] || ' ' || t[i+1]
        |    for i in generate_series(1, len(t)-1)]) AS pr FROM d)),
        |c AS (SELECT w1, w2, count(*) AS cnt FROM p GROUP BY 1,2),
        |tot AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS total FROM c GROUP BY 1),
        |r AS (SELECT *, row_number() OVER (
        |  PARTITION BY w1 ORDER BY cnt DESC, w2) AS rank FROM c)
        |SELECT r.w1, w2, cnt, CAST(cnt*1000 // total AS BIGINT) AS cond_permille,
        |  CAST(rank AS INTEGER) AS rank
        |FROM r JOIN tot ON r.w1 = tot.w1 WHERE rank <= ${TextOps.BigramTopK}""".stripMargin,
    "q_group_sample" -> // exact-k per stratum under a keyed-hash order:
      // the same rows on every run, any cluster size
      s"""SELECT lang, doc_id, CAST(rank AS INTEGER) AS rank FROM (
        |  SELECT lang, doc_id, row_number() OVER (
        |    PARTITION BY lang
        |    ORDER BY md5('gs:' || CAST(doc_id AS VARCHAR)), doc_id) AS rank
        |  FROM documents WHERE lang IS NOT NULL)
        |WHERE rank <= ${TextOps.GroupSampleK}""".stripMargin,
    "q_cdc_merge" -> // rebuild the deterministic changeset and apply the
      // same MERGE: delete keys ≡1 (mod 10), bump keys ≡0, insert fresh
      // keys past max for keys ≡2
      """WITH base AS (SELECT o_orderkey,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS price_c
        |  FROM orders WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL),
        |m AS (SELECT max(o_orderkey) AS mk FROM base)
        |SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 10 = 0 THEN price_c + 500 ELSE price_c END AS price_c
        |FROM base WHERE o_orderkey % 10 != 1
        |UNION ALL
        |SELECT o_orderkey + mk + 1 AS o_orderkey, price_c
        |FROM base, m WHERE o_orderkey % 10 = 2""".stripMargin,
    "q_redact" ->
      """SELECT doc_id,
        |  regexp_replace(text, '[0-9]+', '<NUM>', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_masked,
        |  md5(regexp_replace(text, '[0-9]+', '<NUM>', 'g')) AS redacted_fp
        |FROM documents WHERE text IS NOT NULL""".stripMargin,
    "q_triangles" -> // same triangle SET via the plain a<b<c three-way
      // join — the Spark side's degree orientation is execution
      // strategy, not semantics
      """WITH pp AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
        |e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  JOIN pp x ON a.l_partkey = x.p_partkey
        |  JOIN pp y ON b.l_partkey = y.p_partkey),
        |n AS (SELECT count(DISTINCT v) AS n_nodes FROM
        |  (SELECT a AS v FROM e UNION ALL SELECT b FROM e)),
        |tri AS (SELECT count(*) AS n_triangles
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT n_nodes, (SELECT count(*) FROM e) AS n_edges, n_triangles
        |FROM n, tri""".stripMargin,
    "q_zorder_box" -> // the z-ordered rewrite must be value-invisible:
      // the oracle is the plain 2-d box aggregate over the ORIGINAL table
      """WITH b AS (SELECT o_orderkey, o_custkey,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS cents
        |  FROM orders WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL),
        |m AS (SELECT max(o_custkey) AS mk, max(cents) AS mc FROM b)
        |SELECT count(*) AS n_orders,
        |  CAST(sum(cents) AS BIGINT) AS cents_sum,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust
        |FROM b, m WHERE o_custkey <= mk//4 AND cents <= mc//4""".stripMargin,
    "q_fuzzy_match" -> // deterministic one-char-drop corruption (never
      // char 1, so the first-char block key survives), then best
      // same-block catalog name by levenshtein (ties → name asc)
      """WITH base AS (SELECT p_partkey, p_name FROM part
        |  WHERE p_name IS NOT NULL AND length(p_name) >= 2),
        |names AS (SELECT DISTINCT p_name AS matched_name FROM base),
        |dirty AS (SELECT p_partkey,
        |    substr(p_name, 1, CAST(1 + p_partkey % (length(p_name) - 1) AS INTEGER))
        |    || substr(p_name, CAST(3 + p_partkey % (length(p_name) - 1) AS INTEGER))
        |    AS dirty_name FROM base),
        |c AS (SELECT p_partkey, dirty_name, matched_name,
        |    levenshtein(dirty_name, matched_name) AS dist
        |  FROM dirty JOIN names ON substr(dirty_name,1,1) = substr(matched_name,1,1)),
        |r AS (SELECT *, row_number() OVER (
        |  PARTITION BY p_partkey ORDER BY dist, matched_name) AS rn FROM c)
        |SELECT p_partkey, dirty_name, matched_name, CAST(dist AS INTEGER) AS dist
        |FROM r WHERE rn = 1""".stripMargin,
    "q_scd2" -> // versioned dimension rows from the order log: valid_to
      // = next change's valid_from, NULL (and is_current) on the last
      """SELECT o_custkey, CAST(row_number() OVER w AS INTEGER) AS version,
        |  o_orderkey, o_orderpriority AS pri,
        |  epoch_us(o_orderdate) AS valid_from_us,
        |  epoch_us(lead(o_orderdate, 1) OVER w) AS valid_to_us,
        |  lead(o_orderdate, 1) OVER w IS NULL AS is_current
        |FROM orders WHERE o_orderdate IS NOT NULL
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q_audio_meta" -> // recompute the WAV header fields from the encode
      // formulas and the loudness feature from the PCM synthesis rule:
      // sample j is (byte[j mod n] - 128)·256, and the corpus is pure
      // ASCII so ord(substr) IS the byte (same basis as q_phash_neardup)
      """WITH g AS (SELECT doc_id, text, octet_length(encode(text)) AS n
        |  FROM documents WHERE text IS NOT NULL),
        |f AS (SELECT doc_id, text, n,
        |  CAST(8000 + (n%4)*4000 AS INTEGER) AS sample_rate,
        |  CAST(1 + n%2 AS INTEGER) AS channels,
        |  CAST(64 + n%192 AS BIGINT) AS n_frames FROM g)
        |SELECT doc_id, sample_rate, channels, n_frames,
        |  CAST(n_frames*1000 // sample_rate AS BIGINT) AS duration_ms,
        |  CAST(CASE WHEN n = 0 THEN 0 ELSE
        |      list_sum(list_transform(generate_series(0, n_frames*channels - 1),
        |        j -> abs((ord(substr(text, CAST(j % n AS INTEGER) + 1, 1)) - 128) * 256)))
        |    END // (n_frames*channels) AS BIGINT) AS mean_abs
        |FROM f""".stripMargin,
    "q_audio_energy" -> // same PCM synthesis rule as q_audio_meta, cut
      // into 16-frame windows (last ragged): per window Σs², Σ|s| div n,
      // and the VAD verdict at the fixed threshold
      s"""WITH g AS (SELECT doc_id, text, octet_length(encode(text)) AS n
        |  FROM documents WHERE text IS NOT NULL),
        |f AS (SELECT doc_id, text, n,
        |  CAST(1 + n%2 AS BIGINT) AS ch,
        |  CAST(64 + n%192 AS BIGINT) AS frames FROM g),
        |w AS (SELECT doc_id, text, n, ch, frames,
        |  unnest(generate_series(0, (frames + ${MultimodalOps.AudioWinFrames} - 1)
        |    // ${MultimodalOps.AudioWinFrames} - 1)) AS win_idx FROM f),
        |s AS (SELECT doc_id, win_idx,
        |  [CASE WHEN n = 0 THEN 0
        |     ELSE (ord(substr(text, CAST(j % n AS INTEGER) + 1, 1)) - 128) * 256 END
        |   for j in generate_series(win_idx * ${MultimodalOps.AudioWinFrames} * ch,
        |     least((win_idx + 1) * ${MultimodalOps.AudioWinFrames}, frames) * ch - 1)]
        |  AS samples FROM w)
        |SELECT doc_id, CAST(win_idx AS INTEGER) AS win_idx,
        |  CAST(len(samples) AS BIGINT) AS n_samples,
        |  CAST(list_sum(list_transform(samples, x -> x * x)) AS BIGINT) AS sum_sq,
        |  CAST(list_sum(list_transform(samples, x -> abs(x))) // len(samples)
        |    AS BIGINT) AS mean_abs,
        |  list_sum(list_transform(samples, x -> abs(x))) // len(samples) >=
        |    ${MultimodalOps.AudioVadThreshold} AS is_active
        |FROM s""".stripMargin,
    "q_lang_id" -> {
      val profiles = TextOps.LangProfiles
      val branches = profiles.map { case (l, ws) =>
        val set = ws.map(w => s"'$w'").mkString(", ")
        s"SELECT doc_id, '$l' AS cand, CAST(len(list_filter(string_split(text,' '), x -> x IN ($set))) AS BIGINT) AS score FROM documents WHERE text IS NOT NULL"
      }.mkString("\n  UNION ALL ")
      s"""WITH sc AS ($branches),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand) AS rn FROM sc)
         |SELECT doc_id, cand AS pred_lang, score FROM r WHERE rn = 1""".stripMargin
    },
    "q_asof_join" -> // null probe times excluded: ASOF on NULL is engine-defined
      """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  epoch_us(o.o_orderdate) AS asof_order_us
        |FROM (SELECT * FROM events WHERE ts IS NOT NULL) e ASOF JOIN orders o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin,
    "q_outer_join" ->
      """WITH c AS (SELECT c_nationkey AS ck, count(*) AS n_cust FROM customer GROUP BY 1),
        |s AS (SELECT s_nationkey AS sk, count(*) AS n_supp FROM supplier GROUP BY 1)
        |SELECT coalesce(ck, sk) AS nationkey,
        |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON ck = sk""".stripMargin,
    "q_window_funcs" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS price_c FROM orders)
        |SELECT o_custkey, o_orderkey, price_c,
        |  lag(price_c, 1) OVER seq AS prev_cents,
        |  lead(price_c, 1) OVER seq AS next_cents,
        |  CAST(dense_rank() OVER pr AS INTEGER) AS price_rank,
        |  CAST(ntile(4) OVER pr AS INTEGER) AS quartile
        |FROM o
        |WINDOW seq AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey),
        |       pr AS (PARTITION BY o_custkey ORDER BY price_c DESC, o_orderkey)""".stripMargin,
    "q_subqueries" ->
      """SELECT c_custkey, c_nationkey,
        |  CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents
        |FROM customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        |  AND CAST(round(c_acctbal*100) AS BIGINT) >
        |      (SELECT CAST(round(max(s_acctbal)*100) AS BIGINT)
        |       FROM supplier WHERE s_nationkey = c_nationkey)""".stripMargin,
    "q_scalar_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |  CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
        |  upper(o_orderpriority) AS pri_upper,
        |  substr(o_orderpriority, 1, 1) AS pri1,
        |  CAST(length(o_orderpriority) AS BIGINT) AS pri_len,
        |  abs(CAST(round(o_totalprice*100) AS BIGINT) - 10000000) AS dist_from_100k,
        |  CAST(greatest(year(o_orderdate), 1996) AS INTEGER) AS y_floor,
        |  lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS okey_pad
        |FROM orders""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1""".stripMargin,
    "q_lateral_topk" ->
      """SELECT n_name, t.c_custkey, t.acctbal_cents
        |FROM nation, LATERAL (
        |  SELECT c_custkey, CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents
        |  FROM customer WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""".stripMargin,
    "q_unpivot" ->
      """WITH w AS (SELECT user_id,
        |  CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1)
        |SELECT user_id, event_type, n
        |FROM w UNPIVOT (n FOR event_type IN (click, error, purchase, signup, view))""".stripMargin,
    "q_cube" ->
      """SELECT event_type, CAST(dayofmonth(ts) AS INTEGER) AS dom, count(*) AS n
        |FROM events GROUP BY CUBE(event_type, CAST(dayofmonth(ts) AS INTEGER))""".stripMargin,
    "q_ann_lsh" ->
      s"""WITH w AS (SELECT p, list_transform(generate_series(0,63),
        |    i -> CASE WHEN strpos('89abcdef', substr(md5(p || ':' || i),1,1)) > 0 THEN 1 ELSE -1 END) AS wv
        |  FROM (SELECT unnest(generate_series(0,7)) AS p)),
        |q AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv FROM embeddings),
        |n AS (SELECT vec_id, qv, CAST(list_sum(list_transform(qv, x->x*x)) AS BIGINT) AS nrm FROM q),
        |s AS (SELECT vec_id, p, CAST(list_sum(list_transform(generate_series(1,64),
        |    i -> wv[i]*qv[i])) AS BIGINT) AS sp FROM q CROSS JOIN w),
        |bk AS (SELECT vec_id, CAST(sum(CASE WHEN sp >= 0 THEN (1<<p) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM s GROUP BY 1),
        |e AS (SELECT n.vec_id, qv, nrm, bucket FROM n JOIN bk ON n.vec_id = bk.vec_id),
        |p AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id, a.bucket,
        |  CAST(list_sum(list_transform(generate_series(1,len(a.qv)), i -> a.qv[i]*b.qv[i])) AS BIGINT)
        |    / sqrt(CAST(a.nrm*b.nrm AS DOUBLE)) AS cos
        |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < 16 AND a.vec_id != b.vec_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank FROM p)
        |SELECT query_id, cand_id, CAST(rank AS INTEGER) AS rank, cos, bucket
        |FROM r WHERE rank <= ${VectorOps.AnnTopK}""".stripMargin,
    "q_ann_ivf" -> { // IVF with a TRAINED coarse quantizer: strided seeds
      // refined by IvfIters unrolled Lloyd's iterations (assign by max
      // cosine, update = elementwise integer mean `//` — truncating like
      // Spark's `div`, negatives included), then nearest-centroid
      // assignment (cos DESC, cid ASC), top-nprobe probe, exact cosine
      // within probed lists only
      def dotOf(a: String, b: String) =
        s"CAST(list_sum(list_transform(generate_series(1,len($a)), i -> $a[i]*$b[i])) AS BIGINT)"
      def assignCte(cIn: String, aOut: String) =
        s"""$aOut AS (SELECT vec_id, qv, list_id FROM (
           |  SELECT n.vec_id, n.qv, c.cid AS list_id,
           |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
           |      ${dotOf("n.qv", "c.cv")} / sqrt(CAST(n.nrm*c.cnrm AS DOUBLE)) DESC, c.cid) AS rn
           |  FROM n CROSS JOIN $cIn c) WHERE rn = 1)""".stripMargin
      def updateCte(aIn: String, cOut: String) =
        s"""$cOut AS (SELECT cid, cv,
           |  CAST(list_sum(list_transform(cv, x->x*x)) AS BIGINT) AS cnrm FROM (
           |  SELECT list_id AS cid, list(m ORDER BY pos) AS cv FROM (
           |    SELECT list_id, pos, CAST(CAST(sum(v) AS BIGINT) // count(*) AS BIGINT) AS m
           |    FROM (SELECT list_id, generate_subscripts(qv,1) AS pos, unnest(qv) AS v FROM $aIn)
           |    GROUP BY 1,2) GROUP BY 1))""".stripMargin
      val lloyd = (1 to VectorOps.IvfIters).map { t =>
        assignCte(s"c${t - 1}", s"tr$t") + ",\n" + updateCte(s"tr$t", s"c$t")
      }.mkString(",\n")
      val cFin = s"c${VectorOps.IvfIters}"
      s"""WITH q AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv FROM embeddings),
        |n AS (SELECT vec_id, qv, CAST(list_sum(list_transform(qv, x->x*x)) AS BIGINT) AS nrm FROM q),
        |c0 AS (SELECT vec_id AS cid, qv AS cv, nrm AS cnrm FROM n WHERE vec_id % ${VectorOps.IvfStride} = 0),
        |$lloyd,
        |ac AS (SELECT vec_id, qv, nrm, cid,
        |  ${dotOf("qv", "cv")}
        |    / sqrt(CAST(nrm*cnrm AS DOUBLE)) AS ccos
        |  FROM n CROSS JOIN $cFin),
        |a AS (SELECT vec_id, qv, nrm, cid AS list_id FROM
        |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM ac)
        |  WHERE rn = 1),
        |pr AS (SELECT vec_id AS query_id, qv AS query_v, nrm AS qn, cid AS list_id FROM
        |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
        |   FROM ac WHERE vec_id < ${VectorOps.NumQueries})
        |  WHERE rn <= ${VectorOps.IvfProbes}),
        |p AS (SELECT pr.query_id, a.vec_id AS cand_id, a.list_id,
        |  CAST(list_sum(list_transform(generate_series(1,len(pr.query_v)), i -> pr.query_v[i]*a.qv[i])) AS BIGINT)
        |    / sqrt(CAST(pr.qn*a.nrm AS DOUBLE)) AS cos
        |  FROM pr JOIN a ON pr.list_id = a.list_id AND pr.query_id != a.vec_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank FROM p)
        |SELECT query_id, cand_id, CAST(rank AS INTEGER) AS rank, cos, list_id
        |FROM r WHERE rank <= ${VectorOps.AnnTopK}""".stripMargin
    },
    "q_ann_pq" -> { // product quantization + ADC, all exact int64: per-
      // subspace codebooks (stride seeds + unrolled Lloyd rounds under
      // L2), corpus encoded to nearest codewords, query×codeword
      // distance table, candidate score = sum of M table lookups.
      // Oracle L2 is the direct Σ(a-b)² — mathematically identical in
      // exact integers to Spark's ‖a‖²+‖b‖²−2a·b form.
      val M = VectorOps.PqSubspaces
      val D = VectorOps.PqSubDim
      def l2(a: String, b: String) =
        s"CAST(list_sum(list_transform(generate_series(1,$D), i -> ($a[i]-$b[i])*($a[i]-$b[i]))) AS BIGINT)"
      def l2Full(a: String, b: String) =
        s"CAST(list_sum(list_transform(generate_series(1,${M * D}), i -> ($a[i]-$b[i])*($a[i]-$b[i]))) AS BIGINT)"
      def assignCte(cIn: String, aOut: String) =
        s"""$aOut AS (SELECT vec_id, m, sv, cid FROM (
           |  SELECT s.vec_id, s.m, s.sv, c.cid,
           |    row_number() OVER (PARTITION BY s.vec_id, s.m
           |      ORDER BY ${l2("s.sv", "c.cv")} ASC, c.cid) AS rn
           |  FROM sub s JOIN $cIn c ON s.m = c.m) WHERE rn = 1)""".stripMargin
      def updateCte(aIn: String, cOut: String) =
        s"""$cOut AS (SELECT m, cid, list(v ORDER BY pos) AS cv FROM (
           |    SELECT m, cid, pos, CAST(CAST(sum(x) AS BIGINT) // count(*) AS BIGINT) AS v
           |    FROM (SELECT m, cid, generate_subscripts(sv,1) AS pos, unnest(sv) AS x FROM $aIn)
           |    GROUP BY 1,2,3) GROUP BY 1,2)""".stripMargin
      val lloyd = (1 to VectorOps.PqIters).map { t =>
        assignCte(s"cb${t - 1}", s"pa$t") + ",\n" + updateCte(s"pa$t", s"cb$t")
      }.mkString(",\n")
      val cbFin = s"cb${VectorOps.PqIters}"
      s"""WITH q AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv FROM embeddings),
        |sub AS (SELECT vec_id, m, qv[m*$D+1 : m*$D+$D] AS sv
        |  FROM q, (SELECT unnest(generate_series(0,${M - 1})) AS m) AS ms(m)),
        |cb0 AS (SELECT m, vec_id AS cid, sv AS cv FROM sub WHERE vec_id < ${VectorOps.PqK}),
        |$lloyd,
        |${assignCte(cbFin, "fa")},
        |codes AS (SELECT vec_id, m, cid FROM fa),
        |dt AS (SELECT s.vec_id AS query_id, c.m, c.cid, ${l2("s.sv", "c.cv")} AS d
        |  FROM sub s JOIN $cbFin c ON s.m = c.m WHERE s.vec_id < ${VectorOps.NumQueries}),
        |p AS (SELECT dt.query_id, codes.vec_id AS cand_id, CAST(sum(d) AS BIGINT) AS approx_l2
        |  FROM codes JOIN dt ON codes.m = dt.m AND codes.cid = dt.cid AND codes.vec_id != dt.query_id
        |  GROUP BY 1,2),
        |sl AS (SELECT query_id, cand_id FROM
        |  (SELECT *, row_number() OVER (PARTITION BY query_id
        |     ORDER BY approx_l2 ASC, cand_id) AS prank FROM p)
        |  WHERE prank <= ${VectorOps.PqShortlist}),
        |rr AS (SELECT sl.query_id, sl.cand_id,
        |  ${l2Full("a.qv", "b.qv")} AS l2
        |  FROM sl JOIN q a ON sl.query_id = a.vec_id JOIN q b ON sl.cand_id = b.vec_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |  ORDER BY l2 ASC, cand_id) AS rank FROM rr)
        |SELECT query_id, cand_id, CAST(rank AS INTEGER) AS rank, l2
        |FROM r WHERE rank <= ${VectorOps.TopK}""".stripMargin
    },
    "q_cbo_join" -> // oracle is the plain SQL — catalog statistics must
      // be value-invisible (CBO only re-plans, never re-answers)
      """SELECT c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 480000
        |GROUP BY 1""".stripMargin,
    "q_bucketed_join" -> // oracle is the plain join — bucketing must not change results
      """SELECT c_nationkey,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_active_cust,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,
    "q_partitioned_write" -> // oracle is the plain SQL over the ORIGINAL
      // table — the partitioned write + pruned read-back must not change
      // results
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust
        |FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY 1""".stripMargin,
    "q_dpp_join" -> // oracle is the plain join over the ORIGINAL tables —
      // the partitioned layout + dynamic pruning must not change results
      """SELECT n_name, count(*) AS n_cust,
        |  CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS acctbal_cents
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_regionkey = 1
        |GROUP BY 1""".stripMargin,
    "q_salted_agg" -> // the oracle is the UNsalted direct form — salting must not change results
      """SELECT c_nationkey,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,
    "q_skew_join" -> // AQE's runtime skew split must be value-invisible:
      // the oracle is the same skewed-key join + aggregate, planned flat
      """WITH s AS (SELECT
        |    CASE WHEN user_id % 20 <> 0 THEN 1 ELSE user_id END AS k,
        |    event_type, CAST(round(value*100) AS BIGINT) AS value_c
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(c_nationkey) AS BIGINT) AS sum_nation,
        |  CAST(sum(value_c) AS BIGINT) AS value_cents
        |FROM s JOIN customer ON s.k = c_custkey
        |GROUP BY 1""".stripMargin,
    "q_regex_tokens" ->
      """WITH t AS (SELECT doc_id,
        |  regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]') AS rt
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id,
        |  CAST(len(rt) AS BIGINT) AS n_tokens_regex,
        |  CAST(len(list_filter(rt, x -> regexp_matches(x, '^[A-Za-z]'))) AS BIGINT) AS n_word_tokens,
        |  CAST(len(list_filter(rt, x -> regexp_matches(x, '^[0-9]'))) AS BIGINT) AS n_num_tokens
        |FROM t""".stripMargin,
    // coefficients written out by hand (31^7 .. 31^0) so the oracle stays
    // independent of the Scala loop that builds the Spark-side expression
    "q_rolling_fp" ->
      """WITH h AS (SELECT doc_id,
        |  CASE WHEN length(text) >= 8 THEN
        |    list_transform(generate_series(1, length(text) - 7), i ->
        |      CAST(ord(substr(text, i + 0, 1)) AS BIGINT) * 27512614111
        |    + CAST(ord(substr(text, i + 1, 1)) AS BIGINT) * 887503681
        |    + CAST(ord(substr(text, i + 2, 1)) AS BIGINT) * 28629151
        |    + CAST(ord(substr(text, i + 3, 1)) AS BIGINT) * 923521
        |    + CAST(ord(substr(text, i + 4, 1)) AS BIGINT) * 29791
        |    + CAST(ord(substr(text, i + 5, 1)) AS BIGINT) * 961
        |    + CAST(ord(substr(text, i + 6, 1)) AS BIGINT) * 31
        |    + CAST(ord(substr(text, i + 7, 1)) AS BIGINT))
        |  ELSE CAST([] AS BIGINT[]) END AS hs FROM documents)
        |SELECT doc_id, list_min(hs) AS min_h, list_max(hs) AS max_h,
        |  CAST(len(list_distinct(hs)) AS BIGINT) AS n_distinct_win
        |FROM h""".stripMargin,
    "q_range_join" ->
      """SELECT a.user_id, count(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND epoch_us(b.ts) - epoch_us(a.ts) BETWEEN 0 AND 300000000
        | AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
        |GROUP BY 1""".stripMargin,
    "q_promo_share" ->
      """WITH li AS (SELECT l_partkey,
        |  CAST(round(l_extendedprice*100) AS BIGINT) AS price_c,
        |  CAST(round(l_discount*100) AS BIGINT) AS disc_pct FROM lineitem)
        |SELECT p_brand,
        |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN price_c*(100-disc_pct) ELSE 0 END) AS BIGINT) AS promo_e4,
        |  CAST(sum(price_c*(100-disc_pct)) AS BIGINT) AS revenue_e4,
        |  count(*) AS n_lineitems,
        |  CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN price_c*(100-disc_pct) ELSE 0 END) AS BIGINT)*1000
        |    // CAST(sum(price_c*(100-disc_pct)) AS BIGINT) AS BIGINT) AS promo_permille
        |FROM li JOIN part ON l_partkey = p_partkey
        |GROUP BY 1""".stripMargin,
    // Spark non-ANSI string→int truncates toward zero ("1234.5" → 1234,
    // "-7.9" → -7) and nulls garbage; DuckDB reproduces that as
    // trunc(TRY_CAST(c AS DOUBLE)). The SQL is generated from the
    // PlayerCasts contract (names+types only — the logic is spelled here).
    "q_materialize" -> {
      val exprs = Materialize.PlayerCasts.map {
        case (c, org.apache.spark.sql.types.IntegerType) =>
          s"CAST(trunc(TRY_CAST($c AS DOUBLE)) AS INTEGER) AS $c"
        case (c, org.apache.spark.sql.types.DateType) =>
          s"TRY_CAST($c AS DATE) AS $c"
        case (c, _) => c
      }.mkString(",\n|  ")
      s"""WITH raw AS (SELECT * FROM read_csv('${Materialize.MalformedPlayersCsv}',
        |    header=true, all_varchar=true)),
        |c AS (SELECT $exprs
        |FROM raw)
        |SELECT * FROM c WHERE player_id IS NOT NULL""".stripMargin
    },
    "q_approx_distinct" -> // the sketch estimate itself is engine-specific;
      // the hash-checked surface is the exact count + the sketch's error
      // bound holding (within_bound TRUE) — a broken HLL flips the boolean
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  count(*) AS n, TRUE AS within_bound
        |FROM events GROUP BY 1""".stripMargin,
    "q_approx_percentile" -> // exact discrete median (no-lerp integer index)
      // + the GK rank-error bound holding on the sketch's pick
      """WITH b AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |r AS (SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM b)
        |SELECT event_type,
        |  max(CASE WHEN rn = (n-1)//2 + 1 THEN cents END) AS median_cents,
        |  count(*) AS n, TRUE AS within_bound
        |FROM r GROUP BY 1""".stripMargin,
    "q_substring_dedup" -> { // K-token window hashes (15-hex md5 prefix ≡
      // Spark's 60-bit numeric form); a hash in ≥2 docs marks duplicated
      // text; <K-token docs have no windows in either engine
      val k = DedupOps.SubstrWindow
      s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |w AS (SELECT doc_id, list_distinct(
        |    [substr(md5(array_to_string(t[i:i+${k - 1}], ' ')),1,15)
        |     for i in generate_series(1, len(t)-${k - 1})]) AS ws FROM d),
        |e AS (SELECT doc_id, unnest(ws) AS wh FROM w),
        |g AS (SELECT wh, count(DISTINCT doc_id) AS nd FROM e GROUP BY 1)
        |SELECT e.doc_id, count(*) AS n_win,
        |  CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_win,
        |  CAST(CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)*1000
        |    // count(*) AS BIGINT) AS dup_permille
        |FROM e JOIN g USING (wh) GROUP BY 1""".stripMargin
    },
    "q_seq_pack" -> // concat-then-chunk packing per source stratum; a doc
      // lands in the bin where its start offset falls (cum - n) // cap
      s"""WITH d AS (SELECT source, doc_id,
        |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
        |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
        |c AS (SELECT source, doc_id, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM d)
        |SELECT source, CAST((cum - n_tokens) // ${TextOps.PackCapacity} AS BIGINT) AS bin,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  min(doc_id) AS first_doc
        |FROM c GROUP BY 1,2""".stripMargin,
    "q_inverted_index" -> // df + first-P posting list; the [1:P] slice is
      // 1-based inclusive, matching Spark's rank guard rn <= P
      s"""WITH e AS (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS term
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT term, count(*) AS df,
        |  array_to_string(list_transform(
        |    (list(doc_id ORDER BY doc_id))[1:${TextOps.PostingsCap}],
        |    d -> CAST(d AS VARCHAR)), ',') AS postings
        |FROM e GROUP BY 1""".stripMargin,
    "q_percentiles" -> // discrete: element at integer index (n-1)*p — no lerp doubles
      """WITH o AS (SELECT o_orderpriority,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS price_c FROM orders),
        |r AS (SELECT o_orderpriority, price_c,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY price_c NULLS FIRST) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n FROM o)
        |SELECT o_orderpriority,
        |  max(CASE WHEN rn = (n-1)//2 + 1 THEN price_c END) AS median_cents,
        |  max(CASE WHEN rn = ((n-1)*9)//10 + 1 THEN price_c END) AS p90_cents,
        |  count(*) AS n
        |FROM r GROUP BY 1""".stripMargin,
    "q_dedup_survivors" -> // CC over the verified ngram-jaccard ≥ 0.5 pair
      // graph (the recursive closure is order-free, exactly like Spark's
      // min-label loop), then one kept doc per cluster by
      // (n_tokens DESC, doc_id); the 0.5 test compares the same
      // int→double division both engines compute
      """WITH RECURSIVE sh0 AS (SELECT doc_id, lang, source,
         |  list_distinct(list_transform(
         |    [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
         |     for i in generate_series(1, len(t)-2)],
         |    x -> substr(md5(x),1,15))) AS sh
         |  FROM (SELECT doc_id, lang, source, string_split(text,' ') AS t FROM documents)),
         |shb AS (SELECT *, length(bin(CAST(len(sh) AS BIGINT))) AS band FROM sh0),
         |p0 AS (SELECT least(a.doc_id, b.doc_id) AS doc_a, greatest(a.doc_id, b.doc_id) AS doc_b,
         |  CAST(len(list_intersect(a.sh,b.sh)) AS BIGINT) AS inter,
         |  CAST(len(list_distinct(list_concat(a.sh,b.sh))) AS BIGINT) AS uni
         |  FROM shb a JOIN shb b ON a.lang=b.lang AND a.source=b.source
         |    AND (b.band = a.band + 1 OR (b.band = a.band AND a.doc_id < b.doc_id))),
         |p AS (SELECT doc_a, doc_b FROM p0
         |  WHERE inter > 0 AND CAST(inter AS DOUBLE)/uni >= 0.5),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM p
         |  UNION ALL SELECT doc_b, doc_a FROM p),
         |nodes AS (SELECT doc_id FROM documents WHERE text IS NOT NULL),
         |reach AS (
         |  SELECT doc_id, doc_id AS r FROM nodes
         |  UNION
         |  SELECT e.b AS doc_id, reach.r FROM reach JOIN edges e ON reach.doc_id = e.a
         |),
         |cl AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
         |st AS (SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
         |  FROM documents WHERE text IS NOT NULL),
         |rr AS (SELECT cl.cluster_id, st.doc_id, st.n_tokens,
         |  row_number() OVER (PARTITION BY cl.cluster_id
         |    ORDER BY st.n_tokens DESC, st.doc_id ASC) AS rn
         |  FROM cl JOIN st ON cl.doc_id = st.doc_id)
         |SELECT cluster_id, count(*) AS n_docs,
         |  max(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc,
         |  max(CASE WHEN rn = 1 THEN n_tokens END) AS kept_tokens
         |FROM rr GROUP BY 1""".stripMargin,
    "q_cohort_retention" -> // integer epoch weeks: epoch_µs // week_µs
      """WITH e AS (SELECT user_id, epoch_us(ts)//604800000000 AS week FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |u AS (SELECT DISTINCT user_id, week FROM e),
        |c AS (SELECT user_id, min(week) AS cohort_week FROM u GROUP BY 1),
        |a AS (SELECT c.cohort_week, u.week - c.cohort_week AS week_offset,
        |    count(*) AS n_active
        |  FROM u JOIN c USING (user_id) GROUP BY 1, 2),
        |w AS (SELECT cohort_week, week_offset, n_active,
        |    max(CASE WHEN week_offset = 0 THEN n_active END)
        |      OVER (PARTITION BY cohort_week) AS cohort_users FROM a)
        |SELECT cohort_week, week_offset, n_active, cohort_users,
        |  (n_active*1000)//cohort_users AS retained_permille FROM w""".stripMargin,
    "q_data_profile" -> { // same single-aggregate-then-unpivot shape: min/
      // max computed on the typed (cents/µs) value, stringified after
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice_c", "o_orderdate_us", "o_orderpriority")
      val aggs = cols.map(c =>
        s"count($c) AS nn_$c, count(DISTINCT $c) AS nd_$c, " +
          s"CAST(min($c) AS VARCHAR) AS mn_$c, CAST(max($c) AS VARCHAR) AS mx_$c")
        .mkString(", ")
      val rows = cols.map(c =>
        s"SELECT '$c' AS col_name, nn_$c AS n_nonnull, n_rows - nn_$c AS n_null, " +
          s"nd_$c AS n_distinct, mn_$c AS min_str, mx_$c AS max_str FROM a")
        .mkString("\n", "\nUNION ALL ", "")
      s"""WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus,
         |    CAST(round(o_totalprice*100) AS BIGINT) AS o_totalprice_c,
         |    epoch_us(o_orderdate) AS o_orderdate_us, o_orderpriority FROM orders),
         |a AS (SELECT count(*) AS n_rows, $aggs FROM o)$rows""".stripMargin
    },
    "q_histogram" ->
      s"""WITH o AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS price_c
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |b AS (SELECT price_c//${ProfileOps.HistBinCents} AS bin, count(*) AS n,
        |    min(price_c) AS min_cents, max(price_c) AS max_cents,
        |    CAST(sum(price_c) AS BIGINT) AS sum_cents
        |  FROM o GROUP BY 1)
        |SELECT bin, n, min_cents, max_cents, sum_cents,
        |  bin*${ProfileOps.HistBinCents} AS bin_lo_cents FROM b""".stripMargin,
    "q_iqr_outliers" -> // discrete quartiles + Tukey fences in half-cents
      """WITH e AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |r AS (SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM e),
        |q AS (SELECT event_type, max(n) AS n,
        |    max(CASE WHEN rn = (n-1)//4 + 1 THEN cents END) AS q1_cents,
        |    max(CASE WHEN rn = ((n-1)*3)//4 + 1 THEN cents END) AS q3_cents
        |  FROM r GROUP BY 1),
        |o AS (SELECT e.event_type, q.q1_cents, q.q3_cents, q.n,
        |    CAST(sum(CASE WHEN e.cents*2 < q.q1_cents*2 - (q.q3_cents-q.q1_cents)*3
        |      OR e.cents*2 > q.q3_cents*2 + (q.q3_cents-q.q1_cents)*3
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |  FROM e JOIN q USING (event_type) GROUP BY 1, 2, 3, 4)
        |SELECT event_type, q1_cents, q3_cents, n, n_outliers,
        |  n - n_outliers AS n_kept FROM o""".stripMargin,
    "q_bloom_filter" -> { // md5-nibble bit positions: the ORACLE rebuilds
      // the identical bitset, so build + probe are fully hash-gated
      def nib(h: String, c: Int) =
        s"(strpos('0123456789abcdef', substr($h, $c, 1))-1)"
      def pos(j: Int, key: String) = {
        val h = s"md5('$j:' || CAST($key AS VARCHAR))"
        s"(((${nib(h, 1)})*256 + (${nib(h, 2)})*16 + (${nib(h, 3)})) % ${ProfileOps.BloomBits})"
      }
      val buildPos = (0 until ProfileOps.BloomHashes).map(j => pos(j, "key")).mkString(", ")
      val probeHit = (0 until ProfileOps.BloomHashes)
        .map(j => s"list_contains(b.bloom, ${pos(j, "pkey")})").mkString(" AND ")
      s"""WITH m AS (SELECT c_nationkey AS nationkey, c_custkey AS key FROM customer
         |  WHERE c_custkey IS NOT NULL AND c_nationkey IS NOT NULL),
         |bloomt AS (SELECT nationkey, list_sort(list(DISTINCT pos)) AS bloom
         |  FROM (SELECT nationkey, unnest([$buildPos]) AS pos FROM m) GROUP BY 1),
         |cnts AS (SELECT nationkey, count(DISTINCT key) AS n_members FROM m GROUP BY 1),
         |p AS (SELECT s_nationkey AS nationkey, s_suppkey AS pkey FROM supplier
         |  WHERE s_suppkey IS NOT NULL AND s_nationkey IS NOT NULL),
         |ph AS (SELECT p.nationkey, p.pkey, ($probeHit) AS hit
         |  FROM p JOIN bloomt b USING (nationkey)),
         |tm AS (SELECT DISTINCT nationkey, key FROM m),
         |pj AS (SELECT ph.nationkey, ph.hit, (tm.key IS NOT NULL) AS member
         |  FROM ph LEFT JOIN tm ON ph.nationkey = tm.nationkey AND ph.pkey = tm.key),
         |g AS (SELECT nationkey, count(*) AS n_probes,
         |    CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
         |    CAST(sum(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT) AS n_true_members,
         |    CAST(sum(CASE WHEN member AND NOT hit THEN 1 ELSE 0 END) AS BIGINT) AS n_missed
         |  FROM pj GROUP BY 1)
         |SELECT g.nationkey, g.n_probes, g.n_bloom_hits, g.n_true_members, g.n_missed,
         |  CAST(len(b.bloom) AS BIGINT) AS n_bits_set, c.n_members
         |FROM g JOIN bloomt b USING (nationkey) JOIN cnts c USING (nationkey)""".stripMargin
    },
    "q_frame_sample" -> // frames PARSED from the acTL chunk Spark-side;
      // the oracle derives the same count from the generator formula
      // (parsed ≡ derived is MultimodalSpec's contradiction-proof), and
      // the frame fingerprint is the documented deterministic stub
      s"""WITH m AS (SELECT doc_id, 1 + octet_length(encode(text)) % 8 AS frames
        |  FROM documents WHERE text IS NOT NULL),
        |f AS (SELECT doc_id, unnest(generate_series(0, frames - 1, ${MultimodalOps.FrameStep})) AS frame_idx
        |  FROM m)
        |SELECT doc_id, frame_idx, md5(doc_id || ':' || frame_idx) AS frame_fp
        |FROM f""".stripMargin,
    "q_drift_profile" -> { // two time halves profiled in one pass; the
      // midpoint split is the same (min+max)//2 the streaming oracles use
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice_c", "o_orderdate_us", "o_orderpriority")
      val aggs = cols.map(c =>
        s"count($c) AS nn_$c, count(DISTINCT $c) AS nd_$c").mkString(", ")
      val rows = cols.map(c =>
        s"SELECT half, '$c' AS col_name, n_rows, nn_$c AS n_nonnull, nd_$c AS n_distinct, " +
          s"((n_rows - nn_$c)*1000)//n_rows AS null_permille FROM a")
        .mkString("\n", "\nUNION ALL ", "")
      s"""WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus,
         |    CAST(round(o_totalprice*100) AS BIGINT) AS o_totalprice_c,
         |    epoch_us(o_orderdate) AS o_orderdate_us, o_orderpriority FROM orders),
         |b AS (SELECT (min(o_orderdate_us) + max(o_orderdate_us))//2 AS split_us FROM o),
         |h AS (SELECT o.*, CASE WHEN o_orderdate_us <= b.split_us THEN 'a' ELSE 'b' END AS half
         |  FROM o, b),
         |a AS (SELECT half, count(*) AS n_rows, $aggs FROM h GROUP BY 1)$rows""".stripMargin
    },
    "q_minmax_norm" -> // (x-min)*1000 // (max-min) over cents, exact
      """WITH e AS (SELECT event_id, event_type, CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |    AND event_id IS NOT NULL),
        |m AS (SELECT event_id, event_type, cents,
        |    min(cents) OVER (PARTITION BY event_type) AS mn,
        |    max(cents) OVER (PARTITION BY event_type) AS mx FROM e)
        |SELECT event_id, event_type, cents,
        |  CASE WHEN mx = mn THEN 0 ELSE ((cents-mn)*1000)//(mx-mn) END AS scaled_permille
        |FROM m""".stripMargin,
    "q_vocab_coverage" ->
      s"""WITH w AS (SELECT unnest(string_split(text,' ')) AS word FROM documents
        |  WHERE text IS NOT NULL),
        |c AS (SELECT word, count(*) AS cnt FROM w GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_tokens FROM c),
        |top AS (SELECT word, cnt FROM c ORDER BY cnt DESC, word LIMIT ${TextOps.VocabTopK}),
        |r AS (SELECT word, cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, word) AS INTEGER) AS rank,
        |    CAST(sum(cnt) OVER (ORDER BY cnt DESC, word ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt
        |  FROM top)
        |SELECT word, cnt, total_tokens, rank, cum_cnt,
        |  (cum_cnt*1000)//total_tokens AS coverage_permille FROM r, t""".stripMargin,
    "q_lm_score" -> // pair identity is the md5 prefix in BOTH engines, so
      // collisions (if any) collide identically
      s"""WITH tt AS (SELECT doc_id, string_split(text,' ') AS t FROM documents
        |  WHERE text IS NOT NULL),
        |p AS (SELECT doc_id, unnest([substr(md5(t[i] || ' ' || t[i+1]),1,15)
        |    for i in generate_series(1, len(t)-1)]) AS ph FROM tt),
        |c AS (SELECT ph, count(*) AS cnt FROM p GROUP BY 1),
        |d AS (SELECT p.doc_id, count(*) AS n_pairs,
        |    CAST(sum(CASE WHEN c.cnt >= ${TextOps.KnownPairMin} THEN 1 ELSE 0 END) AS BIGINT) AS n_known
        |  FROM p JOIN c USING (ph) GROUP BY 1)
        |SELECT doc_id, n_pairs, n_known, (n_known*1000)//n_pairs AS known_permille
        |FROM d""".stripMargin,
    "q_decontam" -> { // eval set = every DecontamModulus-th doc_id below
      // the id cap (a fixed benchmark manifest's deterministic stand-in);
      // a train doc sharing any K-token window hash with it is contaminated
      val k = DedupOps.SubstrWindow
      val m = DedupOps.DecontamModulus
      val cap = DedupOps.DecontamEvalCap
      s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS t
        |  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
        |w AS (SELECT doc_id, list_distinct(
        |    [substr(md5(array_to_string(t[i:i+${k - 1}], ' ')),1,15)
        |     for i in generate_series(1, len(t)-${k - 1})]) AS ws FROM d),
        |e AS (SELECT doc_id, unnest(ws) AS wh FROM w),
        |ev AS (SELECT DISTINCT wh FROM e WHERE doc_id % $m = 0 AND doc_id < $cap),
        |tr AS (SELECT doc_id, wh FROM e
        |  WHERE NOT (doc_id % $m = 0 AND doc_id < $cap))
        |SELECT tr.doc_id, count(*) AS n_win,
        |  CAST(sum(CASE WHEN ev.wh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |  CAST(CAST(sum(CASE WHEN ev.wh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)*1000
        |    // count(*) AS BIGINT) AS contam_permille
        |FROM tr LEFT JOIN ev ON tr.wh = ev.wh
        |GROUP BY 1
        |HAVING CAST(sum(CASE WHEN ev.wh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) > 0""".stripMargin
    },
    "q_ewma" -> // the recursive CTE states the sequential fold directly:
      // rn → rn+1, s := (s + c) // 2, exactly Spark's aggregate() HOF
      """WITH RECURSIVE t AS (SELECT user_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    CAST(round(value*100) AS BIGINT) AS c
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL
        |    AND value IS NOT NULL AND value >= 0),
        |r AS (
        |  SELECT user_id, rn, c AS s FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.user_id, t.rn, (r.s + t.c) // 2 FROM r JOIN t
        |    ON t.user_id = r.user_id AND t.rn = r.rn + 1)
        |SELECT r.user_id, r.rn AS n_events, r.s AS ewma_cents
        |FROM r JOIN (SELECT user_id, max(rn) AS mr FROM r GROUP BY 1) m
        |  ON r.user_id = m.user_id AND r.rn = m.mr""".stripMargin,
    "q_transitions" -> // tail events (lead = NULL) drop in both engines
      """WITH s AS (SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_id IS NOT NULL AND event_type IS NOT NULL)
        |SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
        |FROM s WHERE next_type IS NOT NULL GROUP BY 1,2""".stripMargin,
    "q_incr_agg" -> // maintenance must be result-invisible: the oracle is
      // the FULL-table aggregate the merged partials must reproduce
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  max(CAST(round(value*100) AS BIGINT)) AS max_cents
        |FROM events GROUP BY 1""".stripMargin,
    "q_compact_files" -> // a layout operator is value-invisible: the oracle
      // aggregates the ORIGINAL table
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents,
        |  min(epoch_us(ts)) AS min_ts_us,
        |  max(epoch_us(ts)) AS max_ts_us
        |FROM events GROUP BY 1""".stripMargin,
    "q_stream_lojoin" -> // left outer: unmatched clicks null-pad exactly
      // once after the watermark proves no purchase can still arrive
      """WITH e AS (SELECT * FROM events
        |  WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |    AND user_id IS NOT NULL AND value IS NOT NULL),
        |c AS (SELECT user_id, ts AS c_ts, event_id AS click_id FROM e
        |  WHERE event_type = 'click'),
        |p AS (SELECT user_id AS p_user, ts AS p_ts, event_id AS purchase_id
        |  FROM e WHERE event_type = 'purchase')
        |SELECT c.user_id, click_id, purchase_id,
        |  epoch_us(c_ts) AS c_ts_us, epoch_us(p_ts) AS p_ts_us
        |FROM c LEFT JOIN p ON c.user_id = p.p_user
        |  AND p_ts BETWEEN c_ts AND c_ts + INTERVAL 1 HOUR""".stripMargin,
    "q_stream_fojoin" -> // full outer: unmatched rows on BOTH sides
      // null-pad exactly once after the watermark closes their window
      """WITH e AS (SELECT * FROM events
        |  WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |    AND user_id IS NOT NULL AND value IS NOT NULL),
        |c AS (SELECT user_id AS c_user, ts AS c_ts, event_id AS click_id
        |  FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id AS p_user, ts AS p_ts, event_id AS purchase_id
        |  FROM e WHERE event_type = 'purchase')
        |SELECT COALESCE(c_user, p_user) AS user_id, click_id, purchase_id,
        |  epoch_us(c_ts) AS c_ts_us, epoch_us(p_ts) AS p_ts_us
        |FROM c FULL JOIN p ON c_user = p_user
        |  AND p_ts BETWEEN c_ts AND c_ts + INTERVAL 1 HOUR""".stripMargin,
    "q_schema_evolution" -> // generation 1 (even keys) predates the
      // priority column; the mergeSchema read null-fills it at scan time
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE o_orderpriority END)
        |    AS n_with_priority
        |FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 1""".stripMargin,
    "q_retention_delete" -> // partition drop ≡ a day-floor cutoff WHERE;
      // null-ts rows sit in the default partition and are retained
      """WITH b AS (SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS m
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events, b
        |WHERE ts IS NULL
        |   OR date_trunc('day', ts) >= date_trunc('day', make_timestamp(m))
        |GROUP BY 1""".stripMargin,
    "q_sketch_intersect" -> // exact overlap by inclusion-exclusion over
      // a distinct (type, user) self-join; the sketch-side verdict is
      // asserted TRUE (approxDistinct discipline)
      """WITH e AS (SELECT DISTINCT event_type, user_id FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |t AS (SELECT DISTINCT event_type FROM e),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b
        |  FROM t a, t b WHERE a.event_type < b.event_type),
        |i AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
        |    count(*) AS c
        |  FROM e x JOIN e y ON x.user_id = y.user_id
        |    AND x.event_type < y.event_type
        |  GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b,
        |  CAST(coalesce(i.c, 0) AS BIGINT) AS exact_intersect,
        |  TRUE AS within_bound
        |FROM p LEFT JOIN i ON p.type_a = i.type_a AND p.type_b = i.type_b""".stripMargin,
    "q_sketch_union" -> // sketch bytes are engine-specific; the oracle
      // recomputes the exact union cardinality and asserts the bound
      """SELECT count(DISTINCT event_type) AS n_sketches,
        |  count(DISTINCT user_id) AS exact_users,
        |  TRUE AS within_bound
        |FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL""".stripMargin,
    "q_skyline" -> // the dominance DEFINITION itself — independent of the
      // window-based frontier algorithm the engine runs
      """WITH t AS (SELECT o_orderkey,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
        |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS d_us
        |  FROM orders WHERE o_orderkey IS NOT NULL
        |    AND o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL)
        |SELECT o_orderkey, price_cents, d_us FROM t r
        |WHERE NOT EXISTS (SELECT 1 FROM t s
        |  WHERE s.price_cents >= r.price_cents AND s.d_us >= r.d_us
        |    AND (s.price_cents > r.price_cents OR s.d_us > r.d_us))""".stripMargin,
    "q_bfs" -> // recursive closure with the same hop cap; min(hops) per
      // vertex IS the BFS distance (UNION dedups (v,hops) pairs)
      s"""WITH RECURSIVE pp AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
        |e0 AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  JOIN pp x ON a.l_partkey = x.p_partkey
        |  JOIN pp y ON b.l_partkey = y.p_partkey),
        |sym AS (SELECT a AS src, b AS dst FROM e0
        |  UNION ALL SELECT b, a FROM e0),
        |s0 AS (SELECT min(src) AS s FROM sym),
        |r AS (
        |  SELECT s AS v, CAST(0 AS BIGINT) AS hops FROM s0 WHERE s IS NOT NULL
        |  UNION
        |  SELECT sym.dst, r.hops + 1 FROM r JOIN sym ON sym.src = r.v
        |  WHERE r.hops < ${graft.ops.GraphOps.BfsMaxHops})
        |SELECT v AS p_partkey, min(hops) AS hops FROM r GROUP BY 1""".stripMargin,
    "q_quarantine" -> // a row violating several rules counts under each;
      // CASE WHEN value < 0 is ELSE-0 for null values in both engines
      """WITH c AS (SELECT
        |  CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ts,
        |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user,
        |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
        |  CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_value,
        |  CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_type,
        |  CAST(sum(CASE WHEN ts IS NOT NULL AND user_id IS NOT NULL
        |    AND value IS NOT NULL AND value >= 0 AND event_type IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS valid
        |  FROM events)
        |SELECT 'null_ts' AS rule, null_ts AS n FROM c
        |UNION ALL SELECT 'null_user', null_user FROM c
        |UNION ALL SELECT 'null_value', null_value FROM c
        |UNION ALL SELECT 'negative_value', negative_value FROM c
        |UNION ALL SELECT 'null_type', null_type FROM c
        |UNION ALL SELECT 'valid', valid FROM c""".stripMargin,
    "q_train_split" -> // split = pure function of doc_id (md5 hex bucket);
      // null lang is its own manifest row in both engines
      s"""SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,2) < '${TextOps.TrainThreshold}' THEN 'train'
        |  WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,2) < '${TextOps.ValThreshold}' THEN 'val'
        |  ELSE 'test' END AS split,
        |  lang, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text,' '))) AS BIGINT) AS sum_tokens
        |FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
        |GROUP BY 1,2""".stripMargin,
    "q_stream_dsv2" -> // the streamed complete-mode aggregate over the
      // custom source ≡ the batch form over the same (filtered) id space
      """SELECT 't' || CAST(i % 5 AS VARCHAR) AS event_type,
        |  CAST(sum((i * 48271) % 100000) AS BIGINT) AS sum_cents,
        |  count(*) AS n
        |FROM (SELECT unnest(generate_series(5000, 14999)) AS i)
        |GROUP BY 1""".stripMargin,
    "q_stream_cascade" -> // chained stateful ops ≡ the batch double
      // aggregation: hours first, then hours rolled up to days
      """WITH h AS (SELECT date_trunc('hour', ts) AS hr, event_type,
        |    count(*) AS n,
        |    CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |  FROM events
        |  WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |    AND user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1,2)
        |SELECT epoch_us(date_trunc('day', hr)) AS day_start_us, event_type,
        |  CAST(sum(n) AS BIGINT) AS n,
        |  CAST(sum(value_cents) AS BIGINT) AS value_cents,
        |  count(*) AS n_hours
        |FROM h GROUP BY 1,2""".stripMargin,
    "q_rank_funcs" -> // percent_rank/cume_dist: one IEEE division of
      // exact ints in both engines; ties share values
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |  percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
        |FROM orders
        |WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY CAST(round(o_totalprice*100) AS BIGINT))""".stripMargin,
    "q_array_funcs" -> // list-function battery; slice is 1-based
      // inclusive in both engines, element_at(-1) ≡ the last (max) token
      """WITH t AS (SELECT doc_id,
        |    list_sort(list_distinct(string_split(text, ' '))) AS toks
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_distinct,
        |  array_to_string(toks[1:3], ',') AS first3,
        |  list_contains(toks, 'the') AS has_the,
        |  toks[-1] AS max_tok,
        |  CAST(len(list_intersect(toks, ['the', 'a', 'of'])) AS BIGINT) AS n_stop
        |FROM t""".stripMargin,
    "q_interval_merge" -> // interval union via the cumulative-max sweep;
      // duration is an exact-integer function of value, so span bounds
      // are integer-identical; ties on (s,e) broken by event_id
      s"""WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS s_us,
        |    epoch_us(ts) + (abs(CAST(round(value*100) AS BIGINT))
        |      % ${EventOps.IvDurModulusS} + ${EventOps.IvDurFloorS}) * 1000000 AS e_us
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND value IS NOT NULL AND event_id IS NOT NULL),
        |f AS (SELECT *, max(e_us) OVER (PARTITION BY user_id
        |    ORDER BY s_us, e_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM iv),
        |g AS (SELECT *, CASE WHEN prev_end IS NULL OR s_us > prev_end
        |    THEN 1 ELSE 0 END AS new_span FROM f),
        |h AS (SELECT *, CAST(sum(new_span) OVER (PARTITION BY user_id
        |    ORDER BY s_us, e_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER)
        |      AS span_id FROM g)
        |SELECT user_id, span_id, min(s_us) AS span_start_us,
        |  max(e_us) AS span_end_us, count(*) AS n_events,
        |  max(e_us) - min(s_us) AS covered_us
        |FROM h GROUP BY 1,2""".stripMargin,
    "q_mix_rebalance" -> // same hash-ordered pick under the same
      // per-mille budgets; fingerprint = md5 of the doc_id set in
      // numeric order, so both engines must select identical rows
      s"""WITH w(lang, w_permille) AS (VALUES
        |    ${TextOps.MixWeights.map { case (l, p) => s"('$l',$p)" }.mkString(",")}),
        |r AS (SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)), doc_id) AS rank,
        |    count(*) OVER (PARTITION BY lang) AS n_source
        |  FROM documents WHERE lang IS NOT NULL AND doc_id IS NOT NULL),
        |t AS (SELECT r.*, w.w_permille,
        |    CAST(least(n_source, ${TextOps.MixBudget}*w.w_permille//1000) AS BIGINT)
        |      AS n_target
        |  FROM r JOIN w USING (lang))
        |SELECT lang, w_permille, n_source, n_target, count(*) AS n_sel,
        |  md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS sample_fp
        |FROM t WHERE rank <= n_target
        |GROUP BY 1,2,3,4""".stripMargin,
    "q_semdedup" -> { // SemDeDup: the IVF oracle's Lloyd chain verbatim
      // (same seeds, same integer-mean update, same cos DESC, cid ASC
      // assignment), then within-cluster pairs at cos >= threshold drop
      // every non-min-id similar vector; per-cluster manifest with an
      // md5 fingerprint of the kept id set (string_agg skips the
      // NULL-masked dropped rows, exactly like collect_list)
      def dotOf(a: String, b: String) =
        s"CAST(list_sum(list_transform(generate_series(1,len($a)), i -> $a[i]*$b[i])) AS BIGINT)"
      def assignCte(cIn: String, aOut: String) =
        s"""$aOut AS (SELECT vec_id, qv, list_id FROM (
           |  SELECT n.vec_id, n.qv, c.cid AS list_id,
           |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
           |      ${dotOf("n.qv", "c.cv")} / sqrt(CAST(n.nrm*c.cnrm AS DOUBLE)) DESC, c.cid) AS rn
           |  FROM n CROSS JOIN $cIn c) WHERE rn = 1)""".stripMargin
      def updateCte(aIn: String, cOut: String) =
        s"""$cOut AS (SELECT cid, cv,
           |  CAST(list_sum(list_transform(cv, x->x*x)) AS BIGINT) AS cnrm FROM (
           |  SELECT list_id AS cid, list(m ORDER BY pos) AS cv FROM (
           |    SELECT list_id, pos, CAST(CAST(sum(v) AS BIGINT) // count(*) AS BIGINT) AS m
           |    FROM (SELECT list_id, generate_subscripts(qv,1) AS pos, unnest(qv) AS v FROM $aIn)
           |    GROUP BY 1,2) GROUP BY 1))""".stripMargin
      val lloyd = (1 to VectorOps.IvfIters).map { t =>
        assignCte(s"c${t - 1}", s"tr$t") + ",\n" + updateCte(s"tr$t", s"c$t")
      }.mkString(",\n")
      val cFin = s"c${VectorOps.IvfIters}"
      s"""WITH q AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv FROM embeddings),
        |n AS (SELECT vec_id, qv, CAST(list_sum(list_transform(qv, x->x*x)) AS BIGINT) AS nrm FROM q),
        |c0 AS (SELECT vec_id AS cid, qv AS cv, nrm AS cnrm FROM n WHERE vec_id % ${VectorOps.IvfStride} = 0),
        |$lloyd,
        |ac AS (SELECT vec_id, qv, nrm, cid,
        |  ${dotOf("qv", "cv")}
        |    / sqrt(CAST(nrm*cnrm AS DOUBLE)) AS ccos
        |  FROM n CROSS JOIN $cFin),
        |a AS (SELECT vec_id, qv, nrm, cid AS list_id FROM
        |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM ac)
        |  WHERE rn = 1),
        |d AS (SELECT DISTINCT y.vec_id FROM a x JOIN a y
        |  ON x.list_id = y.list_id AND x.vec_id < y.vec_id
        |  AND ${dotOf("x.qv", "y.qv")}
        |    / sqrt(CAST(x.nrm*y.nrm AS DOUBLE)) >= ${VectorOps.SemDedupCos})
        |SELECT a.list_id, count(*) AS n_members,
        |  count(d.vec_id) AS n_dropped,
        |  count(*) - count(d.vec_id) AS n_kept,
        |  md5(string_agg(CASE WHEN d.vec_id IS NULL
        |    THEN CAST(a.vec_id AS VARCHAR) END, ',' ORDER BY a.vec_id)) AS kept_fp
        |FROM a LEFT JOIN d ON a.vec_id = d.vec_id GROUP BY 1""".stripMargin
    },
    "q_chunk_overlap" -> // same stride grid (generate_series inclusive
      // stop ≡ Spark sequence), same 1-based clamped list slice, same
      // space-joined md5 chunk identity
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
        |c AS (SELECT doc_id, t,
        |    unnest(generate_series(0, len(t) - 1, ${TextOps.ChunkStride})) AS s
        |  FROM d)
        |SELECT doc_id,
        |  CAST(s // ${TextOps.ChunkStride} AS BIGINT) AS chunk_id,
        |  CAST(s AS BIGINT) AS start_tok,
        |  CAST(len(t[s + 1 : s + ${TextOps.ChunkLen}]) AS BIGINT) AS n_chunk_tok,
        |  md5(array_to_string(t[s + 1 : s + ${TextOps.ChunkLen}], ' ')) AS chunk_fp
        |FROM c""".stripMargin,
    "q_asof_exec" -> // the custom merge exec must agree with DuckDB's
      // native ASOF JOIN (same inclusive ≤ semantics, inner form)
      """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  epoch_us(o.o_orderdate) AS asof_order_us
        |FROM (SELECT * FROM events WHERE ts IS NOT NULL) e ASOF JOIN orders o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin,
    "q_asof_sql" -> // the ASOF JOIN *syntax* under the oracle: DuckDB
      // parses its native ASOF JOIN, our parser extension parses ours —
      // both lower to the same inclusive-≤ backward as-of semantics
      """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  epoch_us(o.o_orderdate) AS asof_order_us
        |FROM (SELECT * FROM events WHERE ts IS NOT NULL) e ASOF JOIN orders o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin,
    "q_tokenize_ids" -> // same rank tie-break (cnt DESC, word) and same
      // 1-based positions; OOV id 0 via the left-join coalesce
      s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |e AS (SELECT doc_id, unnest(t) AS word,
        |    generate_subscripts(t, 1) AS pos FROM d),
        |c AS (SELECT word, count(*) AS cnt FROM e GROUP BY 1),
        |v AS (SELECT word, id FROM (SELECT word,
        |    row_number() OVER (ORDER BY cnt DESC, word) AS id FROM c)
        |  WHERE id <= ${TextOps.TokVocabSize}),
        |enc AS (SELECT e.doc_id, e.pos, coalesce(v.id, 0) AS id
        |  FROM e LEFT JOIN v USING (word))
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  coalesce(string_agg(CASE WHEN pos <= ${TextOps.TokEncLen}
        |      THEN CAST(id AS VARCHAR) END, ' ' ORDER BY pos), '') AS ids
        |FROM enc GROUP BY 1""".stripMargin,
    "q_kanon" -> // k-anonymity: QI classes below k emit suppressed
      s"""WITH g AS (SELECT c_nationkey, c_mktsegment,
        |    count(*) AS class_size FROM customer GROUP BY 1, 2)
        |SELECT c.c_custkey,
        |  CASE WHEN g.class_size >= ${ProfileOps.AnonK}
        |    THEN c.c_nationkey END AS nation_q,
        |  CASE WHEN g.class_size >= ${ProfileOps.AnonK}
        |    THEN c.c_mktsegment END AS segment_q,
        |  g.class_size < ${ProfileOps.AnonK} AS suppressed,
        |  g.class_size
        |FROM customer c JOIN g USING (c_nationkey, c_mktsegment)""".stripMargin,
    "q_dataset_checksum" -> // same null sentinels, same 60-bit md5
      // prefix (0x-cast ≡ Spark's conv(..,16,10)), same XOR fold
      """WITH h AS (SELECT source,
        |    ('0x' || substr(md5(concat_ws('|',
        |      coalesce(CAST(doc_id AS VARCHAR), '<null>'),
        |      coalesce(text, '<null>'),
        |      coalesce(lang, '<null>'),
        |      coalesce(source, '<null>'),
        |      coalesce(CAST(n_chars AS VARCHAR), '<null>'))), 1, 15))::BIGINT AS h
        |  FROM documents)
        |SELECT count(*) AS n_rows, bit_xor(h) AS xor_fp,
        |  min(h) AS min_h, max(h) AS max_h,
        |  CASE WHEN GROUPING(source) = 1 THEN 'TOTAL' ELSE source END AS scope
        |FROM h GROUP BY GROUPING SETS ((source), ())""".stripMargin,
    "q_observe" -> // the gate's observed metrics must equal the same
      // aggregates computed directly over the table it rode along
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS null_flags,
        |  min(CAST(l_quantity AS BIGINT)) AS min_qty
        |FROM lineitem
        |WHERE l_orderkey IS NOT NULL AND l_extendedprice IS NOT NULL""".stripMargin,
    "q_bpe_merges" -> bpeOracle,
    "q_incr_dedup" -> // asymmetric probe-vs-index LSH: same 16 md5
      // minhashes and 4-row bands as the self-join family; DISTINCT
      // pairs ≡ Spark's first-matching-band uniqueness; jaccard ≥ 0.8
      // via the integer cross-multiplication
      s"""WITH toks AS (SELECT doc_id, source,
        |    list_distinct(string_split(text,' ')) AS t
        |  FROM documents WHERE text IS NOT NULL),
        |sets AS (SELECT doc_id,
        |    list_distinct(list_transform(t, x -> substr(md5(x),1,15))) AS s
        |  FROM toks),
        |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
        |mh AS (SELECT doc_id, h, min(substr(md5(h || ':' || tok),1,15)) AS mh
        |  FROM tok CROSS JOIN (SELECT unnest(generate_series(0,15)) AS h) AS hs(h)
        |  GROUP BY 1,2),
        |band AS (SELECT doc_id, h//4 AS band,
        |  string_agg(h || ':' || mh, '|' ORDER BY h) AS band_sig
        |  FROM mh GROUP BY 1,2),
        |cand AS (SELECT DISTINCT p.doc_id AS pd, i.doc_id AS idx
        |  FROM band p JOIN band i ON p.band = i.band AND p.band_sig = i.band_sig
        |  JOIN toks tp ON p.doc_id = tp.doc_id
        |  JOIN toks ti ON i.doc_id = ti.doc_id
        |  WHERE tp.source = '${DedupOps.IncomingSource}'
        |    AND ti.source <> '${DedupOps.IncomingSource}'),
        |j AS (SELECT pd, idx FROM cand
        |  JOIN sets x ON pd = x.doc_id JOIN sets y ON idx = y.doc_id
        |  WHERE CAST(len(list_intersect(x.s, y.s)) AS BIGINT) * 10 >=
        |    CAST(len(list_distinct(list_concat(x.s, y.s))) AS BIGINT) * 8),
        |agg AS (SELECT pd, count(*) AS n, min(idx) AS fm FROM j GROUP BY 1)
        |SELECT t.doc_id, CAST(coalesce(agg.n, 0) AS BIGINT) AS n_dup_matches,
        |  agg.fm AS first_match, agg.n IS NOT NULL AS is_dup
        |FROM toks t LEFT JOIN agg ON t.doc_id = agg.pd
        |WHERE t.source = '${DedupOps.IncomingSource}'""".stripMargin,
    "q_snapshot_diff" -> // same key-derived previous snapshot, same
      // null-sentineled md5 content identity
      """WITH cur AS (SELECT doc_id, md5(coalesce(text, '<null>')) AS cur_h
        |  FROM documents WHERE doc_id IS NOT NULL),
        |base AS (SELECT * FROM documents WHERE doc_id IS NOT NULL),
        |prev AS (
        |  SELECT doc_id, CASE WHEN doc_id % 17 = 5
        |      THEN md5(coalesce(substr(text, 1, 10), '<null>'))
        |      ELSE md5(coalesce(text, '<null>')) END AS prev_h
        |    FROM base WHERE doc_id % 17 <> 3
        |  UNION ALL
        |  SELECT doc_id + 10000000, md5(coalesce(text, '<null>'))
        |    FROM base WHERE doc_id % 17 = 7)
        |SELECT doc_id, status FROM (
        |  SELECT coalesce(cur.doc_id, prev.doc_id) AS doc_id,
        |    CASE WHEN prev_h IS NULL THEN 'added'
        |      WHEN cur_h IS NULL THEN 'removed'
        |      WHEN cur_h <> prev_h THEN 'changed'
        |      ELSE 'unchanged' END AS status
        |  FROM cur FULL OUTER JOIN prev ON cur.doc_id = prev.doc_id)
        |WHERE status <> 'unchanged'""".stripMargin,
    "q_dsv2_sink" -> // the manifest-committed sink round trip is
      // value-invisible: oracle over the original table
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL AND n_chars IS NOT NULL
        |GROUP BY 1""".stripMargin,
    "q_snap_skipping" -> // the filtered snap read plans ONLY the files
      // whose recorded #stats admit epoch_tag=2 (SnapshotSpec pins the
      // planned-file count); values are the event_id%4=2 residue slice
      """SELECT event_type, count(*) AS n,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum
        |FROM events
        |WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |  AND user_id IS NOT NULL AND value IS NOT NULL
        |  AND event_type IS NOT NULL AND event_id % 4 = 2
        |GROUP BY event_type""".stripMargin,
    "q_snap_skip_str" -> // per-language epochs: the truncated-ASCII
      // string #stats resolve lang='de' to ONE of five files at scan
      // build (SnapshotSpec pins the planned count); values match the
      // source slice
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(min(doc_id) AS BIGINT) AS min_doc
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL AND lang = 'de'
        |GROUP BY lang""".stripMargin,
    "q_snap_map_evolve" -> // map<string,struct> value rename/drop/widen/
      // add as pure metadata: pre-evolution files promote the narrow
      // value points and null-fill the added field inside every value;
      // keys ('de'/'len' for the de era, 'fr' for the fr era) group the
      // relational reconstruction
      """SELECT k, count(*) AS n_keys,
        |  CAST(sum(points) AS BIGINT) AS sum_points,
        |  CAST(sum(extra) AS BIGINT) AS sum_extra
        |FROM (
        |  SELECT lang AS k, CAST(n_chars AS BIGINT) AS points,
        |    CAST(-1 AS BIGINT) AS extra FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'de'
        |  UNION ALL
        |  SELECT 'len', CAST(n_chars * 2 AS BIGINT), -1 FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'de'
        |  UNION ALL
        |  SELECT lang, n_chars + 9000000000, doc_id FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'fr'
        |)
        |GROUP BY k""".stripMargin,
    "q_snap_array_evolve" -> // array<struct> element rename/drop/widen/
      // add as pure metadata: pre-evolution files promote the narrow
      // element score and null-fill the added field inside every
      // element; the oracle reconstructs the exploded rows relationally
      """SELECT token, count(*) AS n_spans,
        |  CAST(sum(score) AS BIGINT) AS sum_score,
        |  CAST(sum(extra) AS BIGINT) AS sum_extra
        |FROM (
        |  SELECT lang AS token, CAST(n_chars AS BIGINT) AS score,
        |    CAST(-1 AS BIGINT) AS extra FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'de'
        |  UNION ALL
        |  SELECT lang || '2', CAST(n_chars * 2 AS BIGINT), -1
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'de'
        |  UNION ALL
        |  SELECT lang, n_chars + 9000000000, doc_id FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'fr'
        |)
        |GROUP BY token""".stripMargin,
    "q_snap_bloom_skip" -> // doc_id%4 slices: every file's min/max
      // envelope spans near the full key range (stats-only planning
      // keeps all four), the per-file #bloom records resolve the IN
      // probe to the two files holding the keys (SnapshotSpec pins
      // strict-subset planning + zero false negatives)
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL AND doc_id IN (17, 23)""".stripMargin,
    "q_snap_skip_time" -> // per-week epochs: the micros ts #stats prune
      // the three earlier weeks for ts >= Jan 22 (SnapshotSpec pins the
      // planned count); values match the source time window
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum,
        |  min(ts) AS first_ts
        |FROM events
        |WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |  AND event_type IS NOT NULL
        |  AND ts >= TIMESTAMP '2024-01-22 00:00:00'
        |GROUP BY event_type""".stripMargin,
    "q_snap_evolution" -> // the widened DDL serves the union: files
      // written before the n_chars column existed null-fill it, so the
      // evolved aggregates see only odd-doc_id rows
      """SELECT lang, count(*) AS n_docs,
        |  count(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS n_evolved,
        |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
        |    AS sum_chars
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL AND n_chars IS NOT NULL
        |GROUP BY lang""".stripMargin,
    "q_snap_delete" -> // post-DELETE snapshot aggregate: the oracle
      // applies the complement of the deleted predicate to the source
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(min(doc_id) AS BIGINT) AS min_doc
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL
        |  AND NOT (lang = 'es' AND doc_id < 300)
        |GROUP BY lang""".stripMargin,
    "q_snap_dv_delete" -> // merge-on-read delete: IDENTICAL oracle to
      // q_snap_delete — the storage strategy (position-delete files vs
      // copy-on-write rewrite) must be value-invisible
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(min(doc_id) AS BIGINT) AS min_doc
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL
        |  AND NOT (lang = 'es' AND doc_id < 300)
        |GROUP BY lang""".stripMargin,
    "q_snap_cdf_merge" -> // one MERGE, three clauses, each under its
      // own CDC label via the #cdc role tags: matched de docs update
      // (pre/postimage) or delete (every 4th), unmatched fr docs insert
      """SELECT change_type, lang, count(*) AS n_rows,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM (
        |  SELECT 'delete' AS change_type, lang, n_chars FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'de' AND doc_id % 4 = 0
        |  UNION ALL
        |  SELECT 'update_preimage', lang, n_chars FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'de' AND doc_id % 4 <> 0
        |  UNION ALL
        |  SELECT 'update_postimage', lang, n_chars + 5000 FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'de' AND doc_id % 4 <> 0
        |  UNION ALL
        |  SELECT 'insert', lang, n_chars FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'fr'
        |)
        |GROUP BY 1, 2""".stripMargin,
    "q_snap_cdf_cow_pair" -> // ROW TRACKING (round 19): the same
      // three-clause MERGE as q_snap_cdf_merge but COPY-ON-WRITE —
      // per-row ids pair the rewrite's pre/post sides, so each clause
      // serves its own label (storage-strategy-invisible vs the MOR
      // twin) — plus a ROLLBACK served as a per-row paired revert
      """SELECT version, change_type, lang, count(*) AS n_rows,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM (
        |  SELECT CAST(2 AS BIGINT) AS version, 'delete' AS change_type,
        |    lang, n_chars FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'de' AND doc_id % 4 = 0
        |  UNION ALL
        |  SELECT 2, 'update_preimage', lang, n_chars FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'de' AND doc_id % 4 <> 0
        |  UNION ALL
        |  SELECT 2, 'update_postimage', lang, n_chars + 5000 FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'de' AND doc_id % 4 <> 0
        |  UNION ALL
        |  SELECT 2, 'insert', lang, n_chars FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'fr'
        |  UNION ALL
        |  SELECT 3, 'update_preimage', lang, n_chars + 5000 FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'de' AND doc_id % 4 <> 0
        |  UNION ALL
        |  SELECT 3, 'update_postimage', lang, n_chars FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'de' AND doc_id % 4 <> 0
        |  UNION ALL
        |  SELECT 3, 'insert', lang, n_chars FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'de' AND doc_id % 4 = 0
        |  UNION ALL
        |  SELECT 3, 'delete', lang, n_chars FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'fr'
        |)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_snap_cdf" -> // CDC change feed: every epoch's row-level changes
      // reconstructed relationally — inserts from the appends, exact
      // deleted rows from the dv-only epoch, pre+post images from the
      // MOR update, COW-diff deletes, ZERO rows from the compaction
      """WITH complete AS (
        |  SELECT doc_id, lang, n_chars FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL)
        |SELECT CAST(1 AS BIGINT) AS version, 'insert' AS change_type,
        |  lang, count(*) AS n_rows,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM complete WHERE lang IN ('de', 'en') GROUP BY lang
        |UNION ALL
        |SELECT 2, 'insert', lang, count(*), CAST(sum(n_chars) AS BIGINT)
        |FROM complete WHERE lang = 'es' GROUP BY lang
        |UNION ALL
        |SELECT 3, 'delete', lang, count(*), CAST(sum(n_chars) AS BIGINT)
        |FROM complete WHERE lang = 'es' AND doc_id % 3 = 0 GROUP BY lang
        |UNION ALL
        |SELECT 4, 'update_preimage', lang, count(*),
        |  CAST(sum(n_chars) AS BIGINT)
        |FROM complete WHERE lang = 'de' AND doc_id % 5 = 0 GROUP BY lang
        |UNION ALL
        |SELECT 4, 'update_postimage', lang, count(*),
        |  CAST(sum(n_chars + 1000) AS BIGINT)
        |FROM complete WHERE lang = 'de' AND doc_id % 5 = 0 GROUP BY lang
        |UNION ALL
        |SELECT 5, 'delete', lang, count(*), CAST(sum(n_chars) AS BIGINT)
        |FROM complete WHERE lang = 'en' AND doc_id % 7 = 0
        |GROUP BY lang""".stripMargin,
    "q_snap_cdf_stream" -> // the .changes face TAILED as a stream: the
      // same change set as q_snap_cdf minus the COW epoch (the
      // streaming face serves per-file reads; a COW diff is a join,
      // served exactly by the batch API)
      """WITH complete AS (
        |  SELECT doc_id, lang, n_chars FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL)
        |SELECT CAST(1 AS BIGINT) AS version, 'insert' AS change_type,
        |  lang, count(*) AS n_rows,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM complete WHERE lang IN ('de', 'en') GROUP BY lang
        |UNION ALL
        |SELECT 2, 'insert', lang, count(*), CAST(sum(n_chars) AS BIGINT)
        |FROM complete WHERE lang = 'es' GROUP BY lang
        |UNION ALL
        |SELECT 3, 'delete', lang, count(*), CAST(sum(n_chars) AS BIGINT)
        |FROM complete WHERE lang = 'es' AND doc_id % 3 = 0 GROUP BY lang
        |UNION ALL
        |SELECT 4, 'update_preimage', lang, count(*),
        |  CAST(sum(n_chars) AS BIGINT)
        |FROM complete WHERE lang = 'de' AND doc_id % 5 = 0 GROUP BY lang
        |UNION ALL
        |SELECT 4, 'update_postimage', lang, count(*),
        |  CAST(sum(n_chars + 1000) AS BIGINT)
        |FROM complete WHERE lang = 'de' AND doc_id % 5 = 0
        |GROUP BY lang""".stripMargin,
    "q_snap_expire" -> // history retirement is value-invisible to the
      // current table; the clamp/survival/refusal pins run in-query
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL
        |GROUP BY lang""".stripMargin,
    "q_snap_branch" -> // write-audit-publish: main serves exactly the
      // de load plus the PUBLISHED es branch; the dropped zh branch's
      // staged rows never surface
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL AND lang IN ('de', 'es')
        |GROUP BY lang""".stripMargin,
    "q_snap_branch_stream" -> // a STREAM stages its micro-batch epochs
      // on a WAP branch (#forbranch next to the #txn replay records);
      // fast_forward publishes the adds and carries the watermarks —
      // main's final state is the de batch load + the streamed es rows
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL AND lang IN ('de', 'es')
        |GROUP BY lang""".stripMargin,
    "q_snap_ndv" -> // per-file HLL NDV records, merged on the .stats
      // face: exact distinct counts per column plus the deterministic
      // 5%-accuracy bit (lgK=12 is exact below ~512, ~1.6% RSE above)
      """SELECT 'doc_id' AS col_name,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS exact_ndv,
        |  TRUE AS est_ok
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL
        |UNION ALL
        |SELECT 'lang', CAST(count(DISTINCT lang) AS BIGINT), TRUE
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL""".stripMargin,
    "q_snap_branch_overwrite" -> // staged partition BACKFILL: a branch
      // stages INSERT OVERWRITE PARTITION(lang='es') with +1000 chars
      // against the branch's own visible state; fast_forward replays
      // removes+adds as ONE overwrite epoch — published state = de
      // original + es corrected
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM (
        |  SELECT lang, n_chars FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'de'
        |  UNION ALL
        |  SELECT lang, n_chars + 1000 AS n_chars FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'es'
        |)
        |GROUP BY lang""".stripMargin,
    "q_snap_branch_mor" -> // staged MOR delete/update + append on a WAP
      // branch, published by fast_forward as one merge epoch: main's
      // final state = de intact, es minus the even ids, fr with the
      // staged +1000 update applied exactly once
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM (
        |  SELECT doc_id, lang, n_chars FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'de'
        |  UNION ALL
        |  SELECT doc_id, lang, n_chars FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'es' AND doc_id % 2 <> 0
        |  UNION ALL
        |  SELECT doc_id, lang, n_chars + 1000 AS n_chars FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang = 'fr'
        |)
        |GROUP BY lang""".stripMargin,
    "q_snap_nested_evolve" -> // struct-field rename/drop/widen/add as
      // pure metadata: pre-evolution files promote the narrow inner
      // int and null-fill the added field; both eras aggregate under
      // the renamed inner name
      """WITH complete AS (
        |  SELECT doc_id, lang, n_chars FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_score,
        |  CAST(NULL AS BIGINT) AS sum_bonus
        |FROM complete WHERE lang IN ('de', 'es') GROUP BY lang
        |UNION ALL
        |SELECT lang, count(*), CAST(sum(n_chars + 3000000000) AS BIGINT),
        |  CAST(sum(doc_id) AS BIGINT)
        |FROM complete WHERE lang = 'en' GROUP BY lang""".stripMargin,
    "q_snap_cdf_ts" -> // the _commit_timestamp CDC column carries the
      // persisted #ts clock, pinned deterministic
      """WITH complete AS (
        |  SELECT doc_id, lang, n_chars FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL)
        |SELECT CAST(1 AS BIGINT) AS version, 'insert' AS change_type,
        |  CAST(2000000000 AS BIGINT) AS ts_us, count(*) AS n_rows
        |FROM complete WHERE lang = 'de'
        |UNION ALL
        |SELECT 2, 'delete', 3000000000, count(*)
        |FROM complete WHERE lang = 'de' AND doc_id % 4 = 0""".stripMargin,
    "q_snap_cdf_incr" -> // incremental materialization from the feed:
      // signed replay of the change rows must equal the batch
      // recompute of the lifecycle's final state
      """WITH complete AS (
        |  SELECT doc_id, lang, n_chars FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL),
        |finalstate AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN lang = 'de' AND doc_id % 5 = 0
        |         THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |  FROM complete
        |  WHERE lang IN ('de', 'en', 'es')
        |    AND NOT (lang = 'es' AND doc_id % 3 = 0)
        |    AND NOT (lang = 'en' AND doc_id % 7 = 0))
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM finalstate GROUP BY lang""".stripMargin,
    "q_snap_dv_update" -> // merge-on-read UPDATE (SupportsDelta
      // position-delta plan): IDENTICAL oracle to q_snap_update — the
      // storage strategy (dv + appended replacement rows vs group COW
      // rewrite) must be value-invisible
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN lang = 'de' THEN n_chars + 1000
        |               ELSE n_chars END) AS BIGINT) AS sum_chars,
        |  CAST(min(CASE WHEN lang = 'de' THEN n_chars + 1000
        |               ELSE n_chars END) AS BIGINT) AS min_chars
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL
        |GROUP BY lang""".stripMargin,
    "q_snap_dv_merge" -> // merge-on-read MERGE (upsert): IDENTICAL
      // oracle to q_snap_merge — value-invisible storage strategy
      """WITH merged AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN lang = 'es' AND doc_id < 300 THEN n_chars * 2
        |         ELSE n_chars END AS n_chars
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL
        |  UNION ALL
        |  SELECT 9000000 + i AS doc_id, 'xx' AS lang, i * 11 AS n_chars
        |  FROM (SELECT unnest(generate_series(1, 3)) AS i)
        |)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM merged GROUP BY lang""".stripMargin,
    "q_snap_colmap" -> // RENAME COLUMN via #colmap: the mapping is
      // value-invisible, so the oracle reproduces the post-rename DML
      // (two inserts, the fr bump) over the ORIGINAL column names
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN lang = 'fr' THEN n_chars + 7 ELSE n_chars END
        |      AS n_chars
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL
        |  UNION ALL
        |  SELECT 9100001, 'xx', 11
        |  UNION ALL
        |  SELECT 9100002, 'xx', 22
        |)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(min(doc_id) AS BIGINT) AS min_id
        |FROM t WHERE doc_id >= 100
        |GROUP BY lang""".stripMargin,
    "q_snap_rename" -> // CTAS staging + RENAME TO promote: the rename
      // is value-invisible, so the oracle is the staging select
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL AND lang <> 'zh'
        |GROUP BY lang""".stripMargin,
    "q_snap_checkpoint" -> // distributed planning over the compaction
      // checkpoint: the planners are value-identical by contract, so
      // the oracle is the plain filtered aggregate
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(min(doc_id) AS BIGINT) AS min_doc
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL AND doc_id >= 100
        |GROUP BY lang""".stripMargin,
    "q_snap_cor" -> // CREATE OR REPLACE TABLE AS SELECT, run twice
      // (the reference's monthly-rebuild DDL): the oracle reproduces
      // the SECOND run's select — the replace must fully supersede
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(n_chars // 100) AS BIGINT) AS sum_hundreds
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL AND lang <> 'zh'
        |GROUP BY lang""".stripMargin,
    "q_snap_history" -> // the .history lifecycle rows are exact by
      // construction: CREATE = metadata epoch 0, five 1-file appends,
      // one merge-on-read delete (#dv epoch, zero files moved)
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), 'metadata', CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(1 AS BIGINT), 'append',   CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(2 AS BIGINT), 'append',   CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(3 AS BIGINT), 'append',   CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(4 AS BIGINT), 'append',   CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(5 AS BIGINT), 'append',   CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(6 AS BIGINT), 'delete',   CAST(0 AS BIGINT), CAST(0 AS BIGINT))
        |) AS t(version, kind, n_added, n_removed)""".stripMargin,
    "q_snap_update" -> // post-UPDATE snapshot aggregate: the oracle
      // CASE-maps the SET clause over the matched slice (runtime group
      // filtering pins: only the 'de' file was rewritten)
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN lang = 'de' THEN n_chars + 1000
        |               ELSE n_chars END) AS BIGINT) AS sum_chars,
        |  CAST(min(CASE WHEN lang = 'de' THEN n_chars + 1000
        |               ELSE n_chars END) AS BIGINT) AS min_chars
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL
        |GROUP BY lang""".stripMargin,
    "q_snap_merge" -> // post-MERGE (upsert) snapshot aggregate: the
      // oracle CASE-maps the WHEN MATCHED update over the source's
      // update slice and UNION ALLs the insert slice
      """WITH merged AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN lang = 'es' AND doc_id < 300 THEN n_chars * 2
        |         ELSE n_chars END AS n_chars
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL
        |  UNION ALL
        |  SELECT 9000000 + i AS doc_id, 'xx' AS lang, i * 11 AS n_chars
        |  FROM (SELECT unnest(generate_series(1, 3)) AS i)
        |)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM merged GROUP BY lang""".stripMargin,
    "q_snap_overwrite" -> // post-INSERT OVERWRITE aggregate: the oracle
      // reproduces the replacement query over the source
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars + 5) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL AND lang <> 'zh'
        |GROUP BY lang""".stripMargin,
    "q_snap_ctas" -> // the CTAS'd table serves exactly the filtered
      // select (schema resolved from the log's #schema records — no
      // conf): the oracle reproduces the select over the source
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(min(doc_id) AS BIGINT) AS min_doc
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL AND lang <> 'fr'
        |GROUP BY lang""".stripMargin,
    "q_snap_ddl" -> // CREATE + INSERT + ALTER ADD COLUMN + evolved
      // INSERT: even-doc_id rows landed pre-evolution null-fill
      // n_chars, odd rows carry it — same union q_snap_evolution
      // serves, driven by pure DDL
      """SELECT lang, count(*) AS n_docs,
        |  count(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS n_evolved,
        |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
        |    AS sum_chars
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL AND n_chars IS NOT NULL
        |GROUP BY lang""".stripMargin,
    "q_snap_files" -> // the .files metadata table over per-language
      // epochs: file count and per-file row counts derive from the
      // source's language histogram; every committed file has bytes
      """WITH c AS (
        |  SELECT lang, count(*) AS n FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL
        |  GROUP BY lang
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(min(n) AS BIGINT) AS min_rows,
        |  CAST(max(n) AS BIGINT) AS max_rows,
        |  CAST(count(*) AS BIGINT) AS n_sized
        |FROM c""".stripMargin,
    "q_snap_partitioned" -> // identity-partitioned create + insert +
      // partition-scoped INSERT OVERWRITE (es gets n_chars+7) + pruned
      // read: the oracle CASE-maps the overwritten partition
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN lang = 'es' THEN n_chars + 7
        |               ELSE n_chars END) AS BIGINT) AS sum_chars,
        |  CAST(min(doc_id) AS BIGINT) AS min_doc
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL AND lang IN ('es', 'de')
        |GROUP BY lang""".stripMargin,
    "q_snap_spec_evolve" -> // identity(lang) era + bucket(8, doc_id)
      // era after a set_partition_spec evolution: the read spans both
      // and the aggregate is value-invisible to the storage layout
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(min(doc_id) AS BIGINT) AS min_doc
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL AND lang IN ('es', 'de', 'en')
        |GROUP BY lang""".stripMargin,
    "q_snap_rollback" -> // good load + bad load + bad COW delete,
      // then CALL graft.sys.rollback restores the good snapshot: the
      // oracle is the aggregate over the good (even doc_id) half
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL AND doc_id % 2 = 0
        |  AND lang IN ('es', 'de', 'en')
        |GROUP BY lang""".stripMargin,
    "q_snap_widen" -> // INT era + post-ALTER BIGINT era with values
      // outside the int range: the oracle recomputes the arithmetic
      // from the source, so a mis-promoted narrow read cannot match
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars * 100000
        |                ELSE n_chars END) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL AND lang IN ('es', 'de', 'en')
        |GROUP BY lang""".stripMargin,
    "q_snap_tag" -> // good load tagged 'blessed', then a bad load and
      // a bad delete; the read pins the tag BY NAME — oracle = the
      // aggregate over the good (even doc_id) half
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL AND doc_id % 2 = 0
        |  AND lang IN ('es', 'de', 'en')
        |GROUP BY lang""".stripMargin,
    "q_snap_partitions" -> // the .partitions metadata table over a
      // one-file-per-language layout: every column recomputed by the
      // oracle from the source corpus
      """SELECT 'lang=' || lang AS "partition",
        |  CAST(0 AS BIGINT) AS spec_id,
        |  CAST(1 AS BIGINT) AS n_files,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(0 AS BIGINT) AS deleted_rows
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL
        |GROUP BY lang""".stripMargin,
    "q_snap_ts_travel" -> // TIMESTAMP AS OF an instant between the
      // good and bad loads (epoch commit times pinned in the query):
      // oracle = the aggregate over the good (even doc_id) half
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL AND doc_id % 2 = 0
        |  AND lang IN ('es', 'de', 'en')
        |GROUP BY lang""".stripMargin,
    "q_snap_compact" -> // the procedure's result row, derived by the
      // oracle from the source: five undersized language files pack
      // into ceil(rows/5000) files
      """SELECT CAST(5 AS BIGINT) AS compacted_files,
        |  CAST(ceil(count(*) / 5000.0) AS BIGINT) AS new_files,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM documents
        |WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |  AND n_chars IS NOT NULL""".stripMargin,
    "q_vacuum_sql" -> // CALL graft.sys.vacuum reclaims exactly the two
      // planted, back-dated orphans (committed files are never
      // candidates — re-counted in the query; age-gating spec-pinned)
      """SELECT * FROM (VALUES ('orphan-a.csv'), ('orphan-b.csv'))
        |  AS t(deleted) ORDER BY deleted""".stripMargin,
    "q_dsv2_scan" -> // regenerate the synthetic source's integer
      // formulas over the pushed id range [25000, 75000)
      """SELECT 't' || CAST(i % 5 AS VARCHAR) AS event_type,
        |  CAST(sum((i * 48271) % 100000) AS BIGINT) AS sum_cents,
        |  count(*) AS n
        |FROM (SELECT unnest(generate_series(25000, 74999)) AS i)
        |GROUP BY 1""".stripMargin,
    "q_dsv2_agg" -> // the aggregate-pushdown scan: same integer
      // formulas, aggregation over the full 200k id space
      """SELECT 't' || CAST(i % 5 AS VARCHAR) AS event_type,
        |  count(*) AS n,
        |  CAST(sum((i * 48271) % 100000) AS BIGINT) AS sum_cents,
        |  CAST(min((i * 2654435761) % 1000) AS BIGINT) AS min_uid,
        |  CAST(max((i * 2654435761) % 1000) AS BIGINT) AS max_uid
        |FROM (SELECT unnest(generate_series(0, 199999)) AS i)
        |GROUP BY 1""".stripMargin,
    "q_dsv2_keyed_agg" -> // the keyed (storage-partitioned) layout is a
      // physical contract only — values must equal the regenerated SQL
      """SELECT 't' || CAST(i % 5 AS VARCHAR) AS event_type,
        |  count(*) AS n,
        |  CAST(sum((i * 48271) % 100000) AS BIGINT) AS sum_cents,
        |  CAST(min((i * 2654435761) % 1000) AS BIGINT) AS min_uid
        |FROM (SELECT unnest(generate_series(0, 199999)) AS i)
        |GROUP BY 1""".stripMargin,
    "q_dsv2_stats" -> // reported statistics are a planner contract
      // only — values must equal the regenerated range joined to
      // customer
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum((i * 48271) % 100000) AS BIGINT) AS cents,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |    AS acctbal_cents
        |FROM (SELECT unnest(generate_series(0, 1999)) AS i)
        |JOIN customer ON i = c_custkey
        |WHERE c_custkey IS NOT NULL
        |GROUP BY 1""".stripMargin,
    "q_dsv2_join_push" -> // the connector-answered join must equal the
      // same join-then-aggregate over two regenerated id ranges
      """WITH l AS (SELECT i AS id,
        |    CAST((i * 48271) % 100000 AS BIGINT) AS value_cents
        |  FROM (SELECT unnest(generate_series(0, 199999)) AS i)),
        |r AS (SELECT i AS id,
        |    CAST((i * 48271) % 100000 AS BIGINT) AS value_cents,
        |    't' || CAST(i % 5 AS VARCHAR) AS event_type
        |  FROM (SELECT unnest(generate_series(0, 119999)) AS i))
        |SELECT r.event_type, count(*) AS n,
        |  CAST(sum(l.value_cents) AS BIGINT) AS cents_l,
        |  CAST(sum(r.value_cents) AS BIGINT) AS cents_r
        |FROM l JOIN r ON l.id = r.id
        |GROUP BY 1""".stripMargin,
    "q_variant_store" -> // stored shredded VARIANT round trip: the
      // storage format must be value-invisible, so the oracle is the
      // q_variant JSON extraction over the ORIGINAL strings
      """WITH e AS (SELECT event_type,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |  CAST(json_extract(props, '$.missing') AS BIGINT) AS m
        |  FROM events WHERE props IS NOT NULL)
        |SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k, count(m) AS n_miss_hits
        |FROM e GROUP BY 1""".stripMargin,
    "q_meta_delete" -> // after the metadata-only partition delete, the
      // table is the raw events minus the dropped type (and minus the
      // write-time null guards)
      """SELECT event_type, count(*) AS n,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events
        |WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        |  AND event_type <> 'error'
        |GROUP BY 1""".stripMargin,
    "q_dsv2_window" -> // the zero-exchange zero-sort window is a
      // physical contract only — values must equal the same window
      // over the regenerated formulas
      """SELECT id, event_type, run_cents FROM (
        |  SELECT i AS id, 't' || CAST(i % 5 AS VARCHAR) AS event_type,
        |    CAST(sum((i * 48271) % 100000)
        |      OVER (PARTITION BY i % 5 ORDER BY i) AS BIGINT) AS run_cents
        |  FROM (SELECT unnest(generate_series(0, 199999)) AS i))
        |WHERE id % 9999 = 0""".stripMargin,
    "q_dsv2_meta" -> // the _slice metadata column is the planned
      // partition ordinal; the 16-way even split of 200k ids is
      // 12500-id blocks, so DuckDB regenerates it as i // 12500
      """SELECT CAST(i // 12500 AS INT) AS slice,
        |  count(*) AS n,
        |  CAST(sum((i * 48271) % 100000) AS BIGINT) AS sum_cents
        |FROM (SELECT unnest(generate_series(0, 199999)) AS i)
        |GROUP BY 1""".stripMargin,
    "q_catalog_fn" -> // catalog-provided band/xsum must equal DuckDB's
      // floor-band and bit_xor (both integer-exact; see CatalogFunctions)
      """SELECT CAST(floor(o_totalprice / 50000) * 50000 AS BIGINT)
        |    AS price_band,
        |  count(*) AS n,
        |  bit_xor(o_orderkey) AS key_xor
        |FROM orders
        |WHERE o_totalprice IS NOT NULL AND o_orderkey IS NOT NULL
        |GROUP BY 1""".stripMargin,
    "q_spj_join" -> // the storage-partitioned join is a physical
      // contract only — values must equal the regenerated two-sided SQL
      """WITH a AS (
        |  SELECT 't' || CAST(i % 5 AS VARCHAR) AS event_type,
        |    count(*) AS n_full,
        |    CAST(sum((i * 48271) % 100000) AS BIGINT) AS cents_full
        |  FROM (SELECT unnest(generate_series(0, 199999)) AS i)
        |  GROUP BY 1),
        |b AS (
        |  SELECT 't' || CAST(i % 5 AS VARCHAR) AS event_type,
        |    CAST(sum((i * 48271) % 100000) AS BIGINT) AS cents_recent
        |  FROM (SELECT unnest(generate_series(0, 49999)) AS i)
        |  GROUP BY 1)
        |SELECT a.event_type, n_full, cents_full, cents_recent
        |FROM a JOIN b ON a.event_type = b.event_type""".stripMargin,
    "q_dsv2_topn" -> // the pushed ORDER BY id DESC LIMIT 42 must equal
      // the same top-N over the regenerated id formulas
      """SELECT i AS id,
        |  CAST((i * 2654435761) % 1000 AS BIGINT) AS user_id,
        |  CAST((i * 48271) % 100000 AS BIGINT) AS value_cents,
        |  't' || CAST(i % 5 AS VARCHAR) AS event_type
        |FROM (SELECT unnest(generate_series(0, 199999)) AS i)
        |ORDER BY i DESC LIMIT 42""".stripMargin,
    "q_dsv2_runtime_filter" -> // the runtime-filtered scan must equal
      // the plain dim join over the regenerated id formulas
      """SELECT n_name, i AS id,
        |  CAST((i * 2654435761) % 1000 AS BIGINT) AS user_id,
        |  CAST((i * 48271) % 100000 AS BIGINT) AS value_cents
        |FROM (SELECT unnest(generate_series(0, 199999)) AS i)
        |JOIN nation ON i = n_nationkey
        |WHERE n_regionkey = 1""".stripMargin,
    "q_catalog_sql" -> // oracle is the identical star join over the raw
      // tables — the TableCatalog naming layer must be value-invisible
      """SELECT n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,
    "q_catalog_events" -> // catalog-served events with the ts normalization
      // must be value-identical to the raw table (DuckDB reads the
      // timestamp[us] column natively)
      """SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us,
        |  event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM events
        |WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,
    "q_rendezvous_shard" -> // HRW argmax over the same 15-hex score
      // strings; list_position ≡ array_position (1-based, first match)
      s"""WITH s AS (SELECT doc_id,
        |    [substr(md5(doc_id || ':' || x), 1, 15)
        |     for x in generate_series(0, ${Materialize.RvShards - 1})] AS s8,
        |    [substr(md5(doc_id || ':' || x), 1, 15)
        |     for x in generate_series(0, ${Materialize.RvShards})] AS s9
        |  FROM documents WHERE doc_id IS NOT NULL)
        |SELECT doc_id,
        |  CAST(list_position(s8, list_max(s8)) - 1 AS INTEGER) AS shard_n,
        |  CAST(list_position(s9, list_max(s9)) - 1 AS INTEGER) AS shard_n1,
        |  list_position(s8, list_max(s8)) != list_position(s9, list_max(s9))
        |    AS moved
        |FROM s""".stripMargin,
  )
}
