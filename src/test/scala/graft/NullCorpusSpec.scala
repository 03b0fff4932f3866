package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Every query must survive a null-riddled corpus: null text/lang/source
  * documents, events with null ts/type/value/user/props, customers and
  * orders with null keys and amounts. The DuckDB-parity of these rows is
  * covered by the oracle WHERE clauses shipped with each query; this spec
  * pins the no-crash / no-surprise property in CI (the round-1 advice
  * flagged exactly this class: "a regenerated corpus with nulls would
  * crash the query"). */
class NullCorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** sf0.001 with null-injected rows, rebuilt through Spark writes (also
    * exercises the plain-TIMESTAMP events path vs the nanos one). */
  lazy val dir: String = {
    // GRAFT_NULLCORPUS_OUT lets the harness land the corpus at a known
    // path for an out-of-band full DuckDB compare (Verify + check on the
    // null corpus — the end-to-end parity sweep the scaladoc cites)
    val d = sys.env.get("GRAFT_NULLCORPUS_OUT") match {
      case Some(p) =>
        val path = java.nio.file.Paths.get(p)
        // the path gets recursively CLEARED — refuse anything that
        // doesn't look like this spec's staging dir, so a typo'd or
        // stale export can't silently destroy an unrelated tree
        require(path.getFileName != null &&
          path.getFileName.toString.startsWith("graft_null"),
          s"refusing to clear $p: GRAFT_NULLCORPUS_OUT must name a graft_null* dir")
        graft.util.Fs.deleteRecursively(path)
        Files.createDirectories(path).toString
      case None => Files.createTempDirectory("graft_nulls").toString
    }
    val src = TestSpark.Sf0001
    def copy(t: String): Unit =
      spark.read.parquet(s"$src/$t.parquet").write.parquet(s"$d/$t.parquet")
    Seq("region", "nation", "supplier", "part", "lineitem", "embeddings").foreach(copy)

    def extend(t: String, extra: Seq[Row],
        post: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = identity): Unit = {
      val base = spark.read.parquet(s"$src/$t.parquet")
      val add = spark.createDataFrame(
        spark.sparkContext.parallelize(extra), base.schema)
      post(base.unionByName(add)).write.parquet(s"$d/$t.parquet")
    }
    extend("documents", Seq(
      Row(9001L, null, "en", "web", 0L),
      Row(9002L, "some plain text here", null, null, 20L),
      Row(9003L, "", "de", "web", 0L)))
    // the source events table is either TIMESTAMP(NANOS) (read as nanos
    // longs under nanosAsLong) or timestamp[us] (read as TIMESTAMP_NTZ,
    // the driver's regenerated corpus). Branch on the landed dtype the
    // same way Tables.events does, so either generation lands as
    // TIMESTAMP_NTZ and exercises the NTZ normalization branch.
    val (tsVal, reland): (Any, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      spark.read.parquet(s"$src/events.parquet").schema("ts").dataType match {
        case LongType =>
          (1704164645000000000L, // 2024-01-02T03:04:05Z as nanos
            _.withColumn("ts", org.apache.spark.sql.functions.expr(
              "cast(timestamp_micros(ts div 1000) as timestamp_ntz)")))
        case TimestampNTZType =>
          (java.time.LocalDateTime.of(2024, 1, 2, 3, 4, 5), identity _)
        case _ => // TimestampType: external type is Instant
          (java.time.Instant.parse("2024-01-02T03:04:05Z"), identity _)
      }
    extend("events", Seq(
      Row(99001L, tsVal, 1L, null, null, null),
      Row(99002L, null, 2L, "click", 1.25, "{\"k\": 5}"),
      Row(99003L, tsVal, null, "view", 2.5, "{\"k\": 6}")),
      post = reland)
    extend("customer", Seq(
      Row(99001L, null, 3, 12.34, "BUILDING"),
      Row(99002L, "Customer#000099002", null, null, null)))
    // o_orderdate is TIMESTAMP_NTZ → LocalDateTime externally
    val odate = java.time.LocalDateTime.of(2024, 1, 2, 3, 4, 5)
    extend("orders", Seq(
      Row(999001L, null, "O", null, null, null),
      Row(999002L, 5L, "F", 123.45, odate, "2-HIGH"),
      // null order date inside a MULTI-row partition: stresses the
      // ASC null-ordering alignment (Spark NULLS FIRST vs DuckDB's
      // NULLS LAST default) that the window oracles pin explicitly
      Row(999003L, 5L, "F", 67.89, null, "1-URGENT")))
    d
  }

  test("every SparkEntry query runs to completion on the null corpus") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, dir).collect(); None }
      catch { case e: Throwable => Some(s"$name: ${e.toString.take(200)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
