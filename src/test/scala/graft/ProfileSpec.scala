package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EventOps, ProfileOps}

/** Profiling / data-quality operator semantics on synthetic tables in the
  * testdata layout. */
class ProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Orders with one null custkey / status / price / date row and a
    * second-bin price. */
  lazy val ordersDir: String = {
    val d = Files.createTempDirectory("graft_profile").toString
    val t1 = Timestamp.valueOf("2023-01-01 00:00:00")
    val t2 = Timestamp.valueOf("2023-02-01 00:00:00")
    Seq(
      (1L, Option(10L), Option("O"), Option(100.0), Option(t1), "1-URGENT"),
      (2L, Option(10L), Option("F"), Option(200.0), Option(t2), "2-HIGH"),
      (3L, None: Option[Long], Option("O"), Option(300.0), Option(t1), "1-URGENT"),
      (4L, Option(20L), None: Option[String], None: Option[Double],
        None: Option[Timestamp], "3-MEDIUM"),
      (5L, Option(30L), Option("O"), Option(60000.0), Option(t2), "5-LOW")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.parquet(s"$d/orders.parquet")
    d
  }

  test("dataProfile: null, distinct, and typed min/max per column") {
    val rows = ProfileOps.dataProfile(spark, ordersDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(rows.keySet.size == 6)
    assert(rows("o_orderkey") == ((5L, 0L, 5L, "1", "5")))
    assert(rows("o_custkey") == ((4L, 1L, 3L, "10", "30")))
    assert(rows("o_orderstatus") == ((4L, 1L, 2L, "F", "O")))
    // min/max on CENTS, stringified after the typed aggregation
    assert(rows("o_totalprice_c") == ((4L, 1L, 4L, "10000", "6000000")))
    assert(rows("o_orderpriority")._2 == 0L)
  }

  test("priceHistogram: equi-width cent bins with exact stats") {
    val bins = ProfileOps.priceHistogram(spark, ordersDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // 100/200/300 dollars land in bin 0; 60k dollars in bin 1
    assert(bins(0L) == ((3L, 10000L, 30000L, 60000L, 0L)))
    assert(bins(1L) == ((1L, 6000000L, 6000000L, 6000000L,
      ProfileOps.HistBinCents)))
  }

  /** Events for the IQR test: 1.00..8.00 plus one 1000.00 outlier. */
  lazy val iqrDir: String = {
    val d = Files.createTempDirectory("graft_iqr").toString
    val base = Timestamp.valueOf("2023-01-01 00:00:00")
    ((1 to 8).map(i => (i.toLong, base, 1L, "a", i.toDouble, "{}")) :+
      (9L, base, 1L, "a", 1000.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("iqrOutliers: discrete quartiles and Tukey fences in half-cents") {
    val r = ProfileOps.iqrOutliers(spark, iqrDir).collect()
    assert(r.length == 1)
    val row = r.head
    // n=9: q1 at rank (8)//4+1 = 3 → 300c, q3 at rank 24//4+1 = 7 → 700c
    assert(row.getAs[Long]("q1_cents") == 300L)
    assert(row.getAs[Long]("q3_cents") == 700L)
    assert(row.getAs[Long]("n") == 9L)
    // fences: [-300, 1300] cents — only the 100000c row is outside
    assert(row.getAs[Long]("n_outliers") == 1L)
    assert(row.getAs[Long]("n_kept") == 8L)
  }

  test("driftProfile: per-half completeness and cardinality, null dates land in half b") {
    // split = mid-January: orders 1,3 (Jan) → half a; 2,5 (Feb) + the
    // null-date order 4 → half b
    val rows = ProfileOps.driftProfile(spark, ordersDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rows(("a", "o_custkey")) == ((2L, 1L, 1L, 500L)))   // order 3's null custkey
    assert(rows(("b", "o_custkey")) == ((3L, 3L, 3L, 0L)))
    assert(rows(("b", "o_orderdate_us")) == ((3L, 2L, 1L, 333L))) // the null date itself
    assert(rows.size == 12)
  }

  test("bloomFilter: no false negatives, bounded bits, exact member counts") {
    val d = Files.createTempDirectory("graft_bloom").toString
    Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 2L))
      .toDF("c_custkey", "c_nationkey").write.parquet(s"$d/customer.parquet")
    Seq((1L, 1L), (99L, 1L), (10L, 2L))
      .toDF("s_suppkey", "s_nationkey").write.parquet(s"$d/supplier.parquet")
    val rows = ProfileOps.bloomFilter(spark, d).collect()
      .map(r => r.getAs[Long]("nationkey") ->
        (r.getAs[Long]("n_probes"), r.getAs[Long]("n_bloom_hits"),
          r.getAs[Long]("n_true_members"), r.getAs[Long]("n_missed"),
          r.getAs[Long]("n_bits_set"), r.getAs[Long]("n_members"))).toMap
    val (p1, h1, t1, miss1, bits1, m1) = rows(1L)
    assert((p1, t1, miss1, m1) == ((2L, 1L, 0L, 3L)))
    assert(h1 >= t1 && h1 <= p1) // member always hits; 99 may false-positive
    assert(bits1 <= 3L * ProfileOps.BloomHashes && bits1 >= 1L)
    val (p2, h2, t2, miss2, _, m2) = rows(2L)
    assert((p2, h2, t2, miss2, m2) == ((1L, 1L, 1L, 0L, 1L)))
  }

  test("minMaxNorm: exact permille scaling, constant group degenerates to 0") {
    val rows = ProfileOps.minMaxNorm(spark, iqrDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("scaled_permille")).toMap
    // range [100c, 100000c]: (x-100)*1000 // 99900
    assert(rows(1L) == 0L)     // the minimum
    assert(rows(9L) == 1000L)  // the maximum
    assert(rows(5L) == 4L)     // 400*1000 // 99900
  }

  /** Events for the cohort test: u1 active weeks 0+1, u2 week 0 only,
    * u3 first seen week 1. */
  lazy val cohortDir: String = {
    val d = Files.createTempDirectory("graft_cohort").toString
    val wk = 604800000L // week in ms
    Seq(
      (1L, new Timestamp(1000L), 1L, "view", 1.0, "{}"),
      (2L, new Timestamp(wk + 5), 1L, "view", 1.0, "{}"),
      (3L, new Timestamp(2000L), 2L, "view", 1.0, "{}"),
      (4L, new Timestamp(wk + 10), 3L, "view", 1.0, "{}"),
      // duplicate activity in an already-counted week must not double-count
      (5L, new Timestamp(3000L), 1L, "click", 2.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("cohortRetention: week cohorts, offsets, and exact per-mille") {
    val rows = EventOps.cohortRetention(spark, cohortDir).collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset")) ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("cohort_users"),
          r.getAs[Long]("retained_permille"))).toMap
    assert(rows((0L, 0L)) == ((2L, 2L, 1000L)))
    assert(rows((0L, 1L)) == ((1L, 2L, 500L)))
    assert(rows((1L, 0L)) == ((1L, 1L, 1000L)))
    assert(rows.size == 3)
  }

  test("kAnonymity: small QI classes suppress, every row keeps its k") {
    val d = Files.createTempDirectory("graft_kanon").toString
    // class (1,A): 9 members (≥ k=8, released); class (2,B): 2 (suppressed)
    ((1L to 9L).map(i => (i, 1L, "A")) ++ Seq((10L, 2L, "B"), (11L, 2L, "B")))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
      .write.parquet(s"$d/customer.parquet")
    val rows = ProfileOps.kAnonymity(spark, d).collect()
      .map(r => r.getAs[Long]("c_custkey") ->
        (Option(r.getAs[java.lang.Long]("nation_q")),
          Option(r.getAs[String]("segment_q")),
          r.getAs[Boolean]("suppressed"), r.getAs[Long]("class_size"))).toMap
    assert(rows.size == 11)
    assert(rows(1L) == ((Some(1L), Some("A"), false, 9L)))
    assert(rows(10L) == ((None, None, true, 2L)))
    // the released table is k-anonymous: no unsuppressed class below k
    assert(rows.values.filter(!_._3).forall(_._4 >= ProfileOps.AnonK))
  }

  test("datasetChecksum: total row folds the per-source fingerprints; " +
    "a one-row edit flips the fingerprint") {
    def write(docs: Seq[(Long, String, String, String, Long)]): String = {
      val d = Files.createTempDirectory("graft_cksum").toString
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$d/documents.parquet")
      d
    }
    val base = Seq((1L, "a b", "en", "s1", 3L), (2L, "c d", "en", "s1", 3L),
      (3L, "e f", "de", "s2", 3L))
    val rows = ProfileOps.datasetChecksum(spark, write(base)).collect()
      .map(r => r.getAs[String]("scope") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("xor_fp"))).toMap
    assert(rows("s1")._1 == 2L && rows("s2")._1 == 1L)
    assert(rows("TOTAL")._1 == 3L)
    // XOR is commutative/associative: total ≡ fold of the source folds
    assert(rows("TOTAL")._2 == (rows("s1")._2 ^ rows("s2")._2))
    // tamper-evidence: one changed char in one row flips the manifest
    val edited = ProfileOps.datasetChecksum(spark,
      write(base.updated(1, (2L, "c D", "en", "s1", 3L)))).collect()
      .map(r => r.getAs[String]("scope") -> r.getAs[Long]("xor_fp")).toMap
    assert(edited("TOTAL") != rows("TOTAL")._2)
    assert(edited("s1") != rows("s1")._2)
    assert(edited("s2") == rows("s2")._2) // untouched source unchanged
  }
}
