package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the event-time operators (SURVEY.md
  * §7.5). Each transform takes a DataFrame and works unchanged on a
  * batch or a `readStream` source — the batch forms in
  * [[graft.ops.EventOps]] are the same plan fragments without watermark.
  * StreamingSpec drives them through MemoryStream and asserts equality
  * with the batch results.
  */
object StreamOps {

  /** Event row for the typed stateful APIs. */
  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

  /** Per-user running state for mapGroupsWithState. */
  case class UserAgg(user_id: Long, n_events: Long, total_cents: Long)

  /** Tumbling event-time window with watermark (append-able sink state:
    * windows finalize once the watermark passes). */
  def tumblingCounts(events: DataFrame, windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(graft.functions.Exact.cents(col("value"))).as("value_cents"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("value_cents"))

  /** [[tumblingCounts]] executed BY THE STREAMING ENGINE end-to-end:
    * events feed a MemoryStream in two micro-batches, the windowed
    * aggregation runs incrementally with watermarked state, and the
    * result is read back from the complete-mode memory sink. The
    * driver-side `collect` is the MemoryStream test-harness contract
    * (a source must be fed from the driver), not part of the operator —
    * in production the source is Kafka/files and nothing collects.
    * Oracle: identical SQL to the batch `q_tumbling_hour`, which is the
    * stream ≡ batch guarantee the engine makes for complete mode. */
  def tumblingHourStreamed(parent: SparkSession, dir: String): DataFrame = {
    // State stores are partitioned by shuffle.partitions AT QUERY START;
    // a few thousand window keys don't need the batch engine's width, and
    // every extra partition is a per-batch store open/commit. An isolated
    // child session pins the stream-side value without mutating the
    // caller's conf (same SparkContext, so the result stays usable).
    val spark = parent.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = graft.sources.Tables.events(spark, dir)
      // Ev's primitive fields reject nulls, and an event without a
      // time/key/value can't be windowed/keyed/summed — the stream
      // ingests complete events only (oracle WHERE mirrors this)
      .filter(col("event_id").isNotNull && col("ts").isNotNull &&
        col("user_id").isNotNull && col("value").isNotNull)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect()
    val source = MemoryStream[Ev]
    val sinkName = "graft_stream_tumbling_sink"
    val query = tumblingCounts(source.toDF(), "1 hour", "1 hour")
      .writeStream.format("memory").queryName(sinkName)
      .outputMode(OutputMode.Complete()).start()
    try {
      val (h1, h2) = evs.splitAt(evs.length / 2)
      source.addData(h1.toIndexedSeq)
      query.processAllAvailable()
      source.addData(h2.toIndexedSeq)
      query.processAllAvailable()
    } finally query.stop()
    spark.table(sinkName)
      .select(unix_micros(col("win_start")).as("win_start_us"),
        col("event_type"), col("n"), col("value_cents"))
  }

  /** Session windows (30-min-style gap) per user with watermark. */
  def sessionCounts(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("sess_start"), col("user_id"), col("n"))

  /** [[sessionCounts]] executed by the streaming engine in APPEND mode —
    * the strictest sink mode: a session row is emitted exactly once,
    * when the watermark passes its close. Events feed in two
    * event-time-ordered micro-batches (ordered feeding is the source
    * contract here — the harness tests the operator, not late-data
    * policy); two far-future sentinel batches then push the watermark
    * past every real session's close (a watermark only advances on the
    * NEXT batch, hence two). The sentinels' own session never finalizes
    * and is filtered by user_id. Oracle: the same gaps-and-islands SQL
    * family as the batch q_session_stats — session_window's merge rule
    * (join if gap < 30 min) is exactly `new session iff gap >= 30 min`. */
  def sessionStreamed(parent: SparkSession, dir: String): DataFrame = {
    // see tumblingHourStreamed: ~150 session keys → narrow state stores
    val spark = parent.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000) % 1000
    val evs = graft.sources.Tables.events(spark, dir)
      .filter(col("event_id").isNotNull && col("ts").isNotNull &&
        col("user_id").isNotNull && col("value").isNotNull) // see tumblingHourStreamed
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().sortBy(e => (micros(e.ts), e.event_id))
    val source = MemoryStream[Ev]
    val sinkName = "graft_stream_session_sink"
    val query = sessionCounts(source.toDF(), "30 minutes", "1 hour")
      .writeStream.format("memory").queryName(sinkName)
      .outputMode(OutputMode.Append()).start()
    try {
      if (evs.nonEmpty) { // an empty stream has no sessions to flush
        val (h1, h2) = evs.splitAt(evs.length / 2)
        source.addData(h1.toIndexedSeq)
        query.processAllAvailable()
        source.addData(h2.toIndexedSeq)
        query.processAllAvailable()
        val far = new java.sql.Timestamp(evs.last.ts.getTime + 30L * 24 * 3600 * 1000)
        source.addData(Ev(-1L, far, -1L, "__sentinel", 0.0))
        query.processAllAvailable()
        source.addData(Ev(-2L, new java.sql.Timestamp(far.getTime + 1000), -1L, "__sentinel", 0.0))
        query.processAllAvailable()
      }
    } finally query.stop()
    spark.table(sinkName).filter(col("user_id") >= 0)
      .select(unix_micros(col("sess_start")).as("sess_start_us"),
        col("user_id"), col("n"))
  }

  /** Streaming exact dedup on event_id within the watermark horizon —
    * the streaming form of DedupOps.dedupExact's hash-group. */
  def dedupByEventId(events: DataFrame, watermark: String): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** Custom keyed state: running per-user event count + exact cents sum
    * via mapGroupsWithState (Update mode). */
  def runningUserTotals(events: Dataset[Ev]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserAgg, UserAgg](GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(uid, 0L, 0L))
          val next = evs.foldLeft(prev) { (acc, e) =>
            UserAgg(uid, acc.n_events + 1,
              acc.total_cents + math.round(e.value * 100))
          }
          state.update(next)
          next
      }
  }

  /** Required OutputMode for [[runningUserTotals]] sinks. */
  val RunningTotalsOutputMode: OutputMode = OutputMode.Update()

  /** A closed activity burst emitted by [[burstDetector]]. */
  case class Burst(user_id: Long, n_events: Long, first_us: Long, last_us: Long)

  /** flatMapGroupsWithState: emits a Burst row whenever a user's batch of
    * events arrives while state already holds a prior burst — a 0..n
    * output per group per trigger, which mapGroupsWithState cannot
    * express. Append mode. */
  def burstDetector(events: Dataset[Ev]): Dataset[Burst] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Burst, Burst](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[Burst]) =>
          // full microseconds: getTime is millis, sub-ms lives in getNanos
          def micros(t: java.sql.Timestamp): Long =
            t.getTime * 1000L + (t.getNanos / 1000) % 1000
          val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          if (sorted.isEmpty) Iterator.empty
          else {
            val closed = state.getOption.iterator
            val burst = Burst(uid, sorted.size.toLong,
              micros(sorted.head.ts), micros(sorted.last.ts))
            state.update(burst)
            closed
          }
      }
  }
}
