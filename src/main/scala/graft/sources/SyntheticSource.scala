package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform, Expression => VExpression}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.expressions.{SortDirection, SortOrder}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownOffset, SupportsPushDownRequiredColumns, SupportsPushDownTopN, SupportsReportPartitioning, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSource V2 batch connector — the extension surface a
  * Spark-native engine uses to make ANY system look like a table. The
  * source is a deterministic synthetic event generator (pure integer
  * formulas of the row id, so the DuckDB oracle regenerates it with
  * `generate_series` — no files involved), but the connector machinery
  * is the real thing a JDBC/Kafka/REST source needs:
  *
  *  - `TableProvider` → `Table` → `ScanBuilder` → `Scan` → `Batch` →
  *    `PartitionReaderFactory` → `PartitionReader[InternalRow]`;
  *  - **filter pushdown** (`SupportsPushDownFilters`): id-range
  *    predicates narrow the generated key space BEFORE partition
  *    planning, so the filtered-out key space is never scheduled (the
  *    slices re-split the SURVIVING range — parallelism stays even) —
  *    the connector-level analog of parquet row-group skipping. Pushed
  *    filters are also left in the residual (returned back to Spark)
  *    exactly like the parquet source: skipping is an optimization,
  *    re-evaluation is the safety net;
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): readers
  *    materialize only the requested fields in the requested order —
  *    a projection that never reaches the generator is work never done;
  *  - **partition planning**: the (possibly narrowed) id range splits
  *    into `slices` even `InputPartition`s — the parallelism contract a
  *    1000-executor cluster schedules against.
  *
  * Usage: `spark.read.format("graft.sources.SyntheticSource")
  * .option("rows", n).option("slices", p).load()`. Schema:
  * (id, user_id, value_cents bigint; event_type string), with
  * user_id = (id·2654435761) mod 1000, value_cents = (id·48271) mod
  * 100000, event_type = 't' ∥ (id mod 5) — Knuth/Lehmer multipliers,
  * all int64-exact. */
class SyntheticSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val partitionBy = properties.getOrDefault("partitionBy", "")
    require(partitionBy.isEmpty || partitionBy == "event_type",
      s"partitionBy supports only event_type, got $partitionBy")
    SyntheticTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "8").toInt,
      properties.getOrDefault("batchRows", "1000").toLong,
      properties.getOrDefault("columnar", "false").toBoolean,
      keyed = partitionBy.nonEmpty)
  }
}

object SyntheticSource {
  val Schema: StructType = new StructType()
    .add("id", LongType, nullable = false)
    .add("user_id", LongType, nullable = false)
    .add("value_cents", LongType, nullable = false)
    .add("event_type", StringType, nullable = false)

  /** Row formulas — ONE definition shared by every reader (and mirrored
    * literally in the q_dsv2_scan oracle SQL). */
  def userId(id: Long): Long = (id * 2654435761L) % 1000L
  def valueCents(id: Long): Long = (id * 48271L) % 100000L
  def eventType(id: Long): String = "t" + (id % 5L)
  /** Distinct event_type values — the keyed layout's partition count. */
  val NumTypes = 5

  /** Last scan's planning facts, for observability and tests: what was
    * pushed, what survived pruning, how many partitions were planned.
    * Driver-side only (planning happens on the driver). */
  @volatile var lastScan: Option[ScanInfo] = None
  final case class ScanInfo(pushedIdLo: Long, pushedIdHi: Long,
    columns: Seq[String], partitions: Int, pushedAggs: Seq[String] = Nil,
    runtimeFilterIds: Option[Int] = None, limitInfo: Seq[String] = Nil,
    pushedJoin: Boolean = false)

  /** One aggregate call accepted by [[SupportsPushDownAggregates]]:
    * `op` ∈ count|sum|min|max, `col` = None for COUNT(*). */
  final case class PushedAggCall(op: String, col: Option[String]) {
    def sqlName: String = s"$op(${col.getOrElse("*")})"
  }
  /** A pushed (partial) aggregation: the scan's output becomes one row
    * per (partition, group) — group columns first, then one column per
    * call, which is the order `V2ScanRelationPushDown` zips the rewritten
    * plan's attributes against. */
  final case class PushedAgg(groupCols: Seq[String], calls: Seq[PushedAggCall]) {
    def schema: StructType = StructType(
      groupCols.map(c => Schema(Schema.fieldIndex(c))) ++
        calls.map { c =>
          val dt = c.col match {
            case _ if c.op == "count" => LongType
            case Some(f) => Schema(Schema.fieldIndex(f)).dataType
            case None => LongType
          }
          // sum/min/max are null for the zero-row global-aggregate case
          StructField(c.sqlName, dt, nullable = c.op != "count")
        })
  }

  /** Micro-batch ranges the streaming side planned — driver-side
    * observability for the offset-contract tests (each entry is one
    * trigger's [start, end)). */
  val plannedBatches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()

  /** The `_slice` metadata column: planned partition ordinal (see
    * [[SyntheticTable.metadataColumns]]). */
  val SliceColName = "_slice"
  object SliceMetadataColumn extends MetadataColumn {
    override def name(): String = SliceColName
    override def dataType(): org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.IntegerType
    override def isNullable: Boolean = false
    override def comment(): String =
      "ordinal of the planned input partition that produced the row"
  }
}

case class SyntheticTable(rows: Long, slices: Int, batchRows: Long,
    columnar: Boolean, keyed: Boolean = false) extends Table with SupportsRead
    with SupportsMetadataColumns {
  require(rows >= 0 && slices > 0 && batchRows > 0,
    s"bad synthetic geometry ($rows, $slices, $batchRows)")
  override def name(): String = s"synthetic($rows)"
  override def schema(): StructType = SyntheticSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, slices, batchRows, columnar, keyed)

  /** METADATA COLUMNS ([[SupportsMetadataColumns]]) — the connector's
    * hidden provenance columns, the DSv2 face of the file source's
    * `_metadata`: absent from the table schema (a `SELECT *` never sees
    * them), resolved only when named, and served by the SAME readers as
    * data columns once the pruned schema requests them. `_slice` is the
    * planned partition ordinal a row came from — the lineage a 100 TB
    * debugging session needs ("which shard produced this row?") without
    * widening the table or paying for it on any query that doesn't ask. */
  override def metadataColumns(): Array[MetadataColumn] =
    Array(SyntheticSource.SliceMetadataColumn)
}

/** Accumulates pushdown state, then freezes into the immutable Scan. */
class SyntheticScanBuilder(rows: Long, slices: Int, batchRows: Long,
    columnar: Boolean, keyed: Boolean = false) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit
    with SupportsPushDownTopN with SupportsPushDownOffset
    with org.apache.spark.sql.connector.read.SupportsPushDownJoin {

  private var lo = 0L
  private var hi = rows // [lo, hi)
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = SyntheticSource.Schema
  private var agg: Option[SyntheticSource.PushedAgg] = None

  import org.apache.spark.sql.connector.read.SupportsPushDownJoin.ColumnWithAlias

  /** JOIN PUSHDOWN ([[org.apache.spark.sql.connector.read
    * .SupportsPushDownJoin]], Spark 4's newest connector face — upstream
    * only JDBC implements it): an INNER equi-join of two relations of
    * THIS source on `id` is answered by the source itself. The key is
    * dense and shared (both sides generate the same id space), so the
    * join of [loL, hiL) ⋈ [loR, hiR) IS the one generated relation over
    * the intersected range, serving both sides' columns — the join
    * operator vanishes from Spark's plan and the scan boundary carries
    * |intersection| rows instead of |left| + |right|. This is the
    * federation contract: a warehouse joins its own tables server-side
    * and ships the result, not the operands — at 100 TB the difference
    * between moving two tables and moving one answer. Output columns
    * keep Spark's de-duplicated names (`ColumnWithAlias`: right-side
    * duplicates arrive aliased, e.g. `id_1`); the reader maps each
    * output name back to its source formula via `srcOf`.
    *
    * Acceptance is deliberately narrow and total: INNER only, both
    * sides plain (no pushed aggregate/limit/offset, not keyed, not
    * already joined), condition exactly `leftId = rightId` (either
    * orientation). Anything else returns false and Spark keeps the
    * join — refusal over approximation, as everywhere in this
    * connector. */
  private var joinedCols: Option[Seq[(String, String)]] = None // out → src

  private def srcCol(name: String): String =
    joinedCols.flatMap(_.collectFirst { case (out, src) if out == name => src })
      .getOrElse(name)

  private def plainForJoin: Boolean =
    agg.isEmpty && limitK.isEmpty && topNDesc.isEmpty && offsetM == 0 &&
      !keyed && joinedCols.isEmpty

  override def isOtherSideCompatibleForJoin(
      other: org.apache.spark.sql.connector.read.SupportsPushDownJoin): Boolean =
    other match {
      case o: SyntheticScanBuilder => plainForJoin && o.plainForJoin
      case _ => false
    }

  override def pushDownJoin(
      other: org.apache.spark.sql.connector.read.SupportsPushDownJoin,
      joinType: org.apache.spark.sql.connector.join.JoinType,
      leftReq: Array[ColumnWithAlias],
      rightReq: Array[ColumnWithAlias],
      condition: org.apache.spark.sql.connector.expressions.filter.Predicate): Boolean = {
    val o = other match {
      case b: SyntheticScanBuilder if plainForJoin && b.plainForJoin => b
      case _ => return false
    }
    if (joinType != org.apache.spark.sql.connector.join.JoinType.INNER_JOIN)
      return false
    def outName(c: ColumnWithAlias): String = Option(c.alias).getOrElse(c.colName)
    val leftId = leftReq.find(_.colName == "id").map(outName)
    val rightId = rightReq.find(_.colName == "id").map(outName)
    val keyEquality = (leftId, rightId) match {
      case (Some(l), Some(r)) if condition.name() == "=" =>
        val names = condition.children().toSeq.collect {
          case n: NamedReference if n.fieldNames.length == 1 => n.fieldNames()(0)
        }
        names.length == 2 &&
          ((names(0) == l && names(1) == r) || (names(0) == r && names(1) == l))
      case _ => false
    }
    if (!keyEquality) return false
    // INNER equi-join on the shared dense key ⇒ the intersected range
    lo = math.max(lo, o.lo)
    hi = math.min(hi, o.hi)
    joinedCols = Some((leftReq ++ rightReq).toSeq.map(c => outName(c) -> c.colName))
    required = StructType(joinedCols.get.map { case (out, src) =>
      SyntheticSource.Schema(SyntheticSource.Schema.fieldIndex(src)).copy(name = out)
    })
    true
  }

  // v + 1 saturating at Long.MaxValue: an EqualTo/LessThanOrEqual on
  // Long.MaxValue must not wrap hi negative and plan an empty scan —
  // the residual filter can only REMOVE rows, never restore them
  private def succ(v: Long): Long =
    if (v == Long.MaxValue) v else v + 1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // match via srcCol so a post-join filter on either side's id column
    // (possibly aliased, e.g. id_1) still narrows the merged range —
    // sound because the pushed join equates the two id columns
    val (handled, rest) = filters.partition {
      case EqualTo(c, _: Long) if srcCol(c) == "id" => true
      case GreaterThan(c, _: Long) if srcCol(c) == "id" => true
      case GreaterThanOrEqual(c, _: Long) if srcCol(c) == "id" => true
      case LessThan(c, _: Long) if srcCol(c) == "id" => true
      case LessThanOrEqual(c, _: Long) if srcCol(c) == "id" => true
      case _ => false
    }
    handled.foreach {
      case EqualTo(_, v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, succ(v))
      case GreaterThan(_, v: Long) => lo = math.max(lo, succ(v))
      case GreaterThanOrEqual(_, v: Long) => lo = math.max(lo, v)
      case LessThan(_, v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual(_, v: Long) => hi = math.min(hi, succ(v))
      case _ =>
    }
    accepted = handled
    // the parquet convention: report what was pushed, but hand EVERY
    // filter back as residual — skipping saves work, Spark's
    // re-evaluation keeps boundary bugs from becoming wrong answers.
    // (Consequence, same as the file sources: aggregate pushdown only
    // composes with a FILTERLESS query, because Spark requires zero
    // post-scan filters before it offers an Aggregation to the source.)
    filters
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Partial-aggregate pushdown ([[SupportsPushDownAggregates]]): the
    * warehouse-side-aggregation contract — accept count/sum/min/max with
    * any subset of the generated columns as group keys, and emit one
    * partial row per (partition, group) instead of the raw rows. Spark
    * plans its own FINAL aggregate on top (sum-of-counts, sum-of-sums,
    * min-of-mins, max-of-maxes), so per-partition partials are exactly
    * the map-side-combine shape — what crosses the scan boundary drops
    * from O(rows) to O(partitions × groups). `supportCompletePushDown`
    * stays false: partials merge correctly on ANY partitioning, complete
    * pushdown would claim each group lives in one partition (untrue for
    * our id-sliced layout). DISTINCT variants are refused — a distinct
    * partial is not mergeable without shipping the distinct sets. */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean = false

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    // the keyed layout serves GROUP-LOCALITY instead: reporting
    // KeyGroupedPartitioning lets the whole aggregate run shuffle-free
    // at the engine; mixing both surfaces would leave neither provable.
    // A pushed JOIN likewise refuses further aggregate pushdown: the
    // aliased output names don't map through the Schema-based call
    // translation, and one provable contract per scan beats two
    // entangled ones.
    if (keyed || joinedCols.nonEmpty) return false
    def fieldOf(e: VExpression): Option[String] = e match {
      case n: NamedReference if n.fieldNames.length == 1 &&
          SyntheticSource.Schema.fieldNames.contains(n.fieldNames()(0)) =>
        Some(n.fieldNames()(0))
      case _ => None
    }
    val groups = aggregation.groupByExpressions.toSeq.map(fieldOf)
    val calls = aggregation.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(SyntheticSource.PushedAggCall("count", None))
      case c: Count if !c.isDistinct =>
        fieldOf(c.column).map(f => SyntheticSource.PushedAggCall("count", Some(f)))
      case s: Sum if !s.isDistinct =>
        // sum over the string column would be a cast Spark didn't ask for
        fieldOf(s.column).filter(_ != "event_type")
          .map(f => SyntheticSource.PushedAggCall("sum", Some(f)))
      case m: Min => fieldOf(m.column).map(f => SyntheticSource.PushedAggCall("min", Some(f)))
      case m: Max => fieldOf(m.column).map(f => SyntheticSource.PushedAggCall("max", Some(f)))
      case _ => None
    }
    if (groups.exists(_.isEmpty) || calls.isEmpty || calls.exists(_.isEmpty)) false
    else {
      agg = Some(SyntheticSource.PushedAgg(groups.flatten, calls.flatten))
      true
    }
  }

  /** LIMIT / top-N / OFFSET pushdown — the scan-boundary ROW-COUNT
    * reduction ([[SupportsPushDownLimit]] / [[SupportsPushDownTopN]] /
    * [[SupportsPushDownOffset]]): ids generate dense-ascending over
    * [lo, hi), so `ORDER BY id` IS the generation order and limit/offset
    * are pure range arithmetic — top-k ascending = [lo, lo+k), top-k
    * descending = [hi-k, hi), skip-m advances an endpoint by m. The
    * warehouse the reference reads does this server-side as a matter of
    * course (a LIMIT never ships the full table); at 100 TB it is the
    * difference between generating k rows and generating everything so
    * an executor-side Limit can discard it.
    *
    * Limit and top-N report PARTIALLY pushed (the same convention as our
    * residual filters): the scan generates ≤ k rows per partition, and
    * Spark's own Sort/Limit stays on top as the safety net — the
    * connector never has to promise a global order across partitions.
    * OFFSET is the one all-or-nothing contract (accepting it DELETES the
    * Offset operator), and Spark only offers it where the source can be
    * exact: a bare OFFSET over the clean relation — there, dropping the
    * m lowest ids is exact. The fully-pushed-limit path can't reach
    * [[pushOffset]] because our limit stays partial; the guard keeps the
    * invariant explicit. */
  private var limitK: Option[Int] = None
  private var topNDesc: Option[Boolean] = None
  private var offsetM: Int = 0

  override def pushLimit(limit: Int): Boolean =
    if (agg.nonEmpty || joinedCols.nonEmpty || limit < 0) false
    else { limitK = Some(limit); true }

  // one answer for both the limit and top-N faces: always partial —
  // Spark keeps its own (Take)Ordered/Limit on top as the safety net
  override def isPartiallyPushed(): Boolean = true

  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    // mirror pushOffset's limit guard: if an offset was already
    // accepted, REFUSE the top-N rather than trip build()'s invariant
    // assert, should a future Spark pushdown ordering ever offer topN
    // after offset
    val onId = agg.isEmpty && joinedCols.isEmpty && offsetM == 0 && limit >= 0 &&
      orders.length == 1 &&
      (orders(0).expression() match {
        case n: NamedReference => n.fieldNames.sameElements(Array("id"))
        case _ => false
      })
    // id is non-nullable, so the order's null placement is irrelevant
    if (onId) {
      topNDesc = Some(orders(0).direction() == SortDirection.DESCENDING)
      limitK = Some(limit)
    }
    onId
  }

  override def pushOffset(offset: Int): Boolean =
    if (agg.nonEmpty || joinedCols.nonEmpty || limitK.nonEmpty || offset < 0) false
    else { offsetM = offset; true }

  // a + b saturating at Long.MaxValue (lo can already sit at MaxValue
  // after an id = Long.MaxValue pushed filter)
  private def satAdd(a: Long, b: Long): Long =
    if (a > Long.MaxValue - b) Long.MaxValue else a + b

  override def build(): Scan = {
    var l = math.max(lo, 0L)
    var h = math.max(hi, l)
    val desc = topNDesc.getOrElse(false)
    limitK.foreach { k =>
      if (desc) l = math.max(l, h - k) else h = math.min(h, satAdd(l, k))
    }
    if (offsetM > 0) {
      // pushOffset refuses when limitK is set and topNDesc is only ever
      // set together with limitK, so an accepted offset is always an
      // ascending skip from the low end
      assert(topNDesc.isEmpty, "offset pushed alongside a TopN")
      l = math.min(h, satAdd(l, offsetM))
    }
    val limitInfo =
      limitK.map { k =>
        topNDesc match {
          case Some(d) =>
            s"PushedTopN: ORDER BY id ${if (d) "DESC" else "ASC"} LIMIT $k"
          case None => s"PushedLimit: LIMIT $k"
        }
      }.toSeq ++
        (if (offsetM > 0) Seq(s"PushedOffset: OFFSET $offsetM") else Nil)
    SyntheticScan(l, h, slices, batchRows, columnar, required, agg, keyed,
      limitInfo,
      srcOf = joinedCols.map(_.toMap).getOrElse(Map.empty))
  }
}

case class SyntheticScan(lo: Long, hi: Long, slices: Int, batchRows: Long,
    columnar: Boolean, required: StructType,
    agg: Option[SyntheticSource.PushedAgg] = None,
    keyed: Boolean = false, limitInfo: Seq[String] = Nil,
    srcOf: Map[String, String] = Map.empty)
  extends Scan with Batch
  with SupportsRuntimeFiltering with SupportsReportPartitioning
  with org.apache.spark.sql.connector.read.SupportsReportOrdering
  with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  override def readSchema(): StructType = agg.map(_.schema).getOrElse(required)

  /** REPORTED statistics ([[org.apache.spark.sql.connector.read
    * .SupportsReportStatistics]]) — the size truth the PLANNER needs:
    * without them a DSv2 relation costs `defaultSizeInBytes`
    * (effectively "huge"), so a pushdown-narrowed scan of a few
    * thousand rows still looks unbroadcastable and the static planner
    * reaches for a shuffle join. Reporting POST-pushdown row count ×
    * row width (the contract: statistics describe the scan as built,
    * after filters/limit narrowed it) lets the same query plan a
    * broadcast join at analysis time instead of waiting for AQE to
    * discover the size at runtime — at 100 TB that is every warehouse
    * dim-scan participating in join planning with its true size
    * (IngestSpec pins the static broadcast with AQE off). */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
    // honest only for raw scans: a pushed aggregate's output cardinality
    // is the group count, which the generator doesn't know — report
    // unknown rather than a wrong number the planner would trust
    val n: Option[Long] =
      if (agg.isEmpty) Some(math.max(0L, hi - lo)) else None
    val rowBytes = readSchema().fields.map(_.dataType.defaultSize + 8L).sum
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        n.fold(java.util.OptionalLong.empty())(v =>
          java.util.OptionalLong.of(v * rowBytes))
      override def numRows(): java.util.OptionalLong =
        n.fold(java.util.OptionalLong.empty())(java.util.OptionalLong.of)
    }
  }

  /** REPORTED ordering ([[org.apache.spark.sql.connector.read
    * .SupportsReportOrdering]]) — the ordering half of the
    * storage-partitioned contract: a keyed partition generates its ids
    * ascending (stride NumTypes) with event_type constant, so every
    * partition is trivially sorted by (event_type, id) and the scan
    * REPORTS it. A window over (PARTITION BY event_type ORDER BY id)
    * then satisfies BOTH its distribution (from the reported
    * partitioning) and its ordering (from here) straight off the scan —
    * zero exchanges AND zero sorts (IngestSpec pins the plan). At
    * 100 TB the eliminated per-partition sort is the dominant cost of
    * every windowed scan over data that storage already keeps in key
    * order (Kafka per-partition offsets, Iceberg sorted files). Only
    * reported while both columns survive pruning and no aggregate was
    * pushed — a pushed aggregate's output rows have no id order. */
  override def outputOrdering(): Array[SortOrder] =
    if (keyed && agg.isEmpty &&
        readSchema().fieldNames.contains("event_type") &&
        readSchema().fieldNames.contains("id"))
      Array(
        org.apache.spark.sql.connector.expressions.Expressions.sort(
          org.apache.spark.sql.connector.expressions.Expressions
            .identity("event_type"), SortDirection.ASCENDING),
        org.apache.spark.sql.connector.expressions.Expressions.sort(
          org.apache.spark.sql.connector.expressions.Expressions
            .identity("id"), SortDirection.ASCENDING))
    else Array.empty

  /** REPORTED partitioning ([[SupportsReportPartitioning]]) — the
    * storage-partitioned contract: with `partitionBy=event_type` the
    * generator keys its partitions by event_type (one partition per
    * type, ids striding by 5) and REPORTS
    * `KeyGroupedPartitioning(identity(event_type), 5)`, so a
    * `groupBy(event_type)` aggregation satisfies its ClusteredDistribution
    * straight off the scan — ZERO exchanges in the whole plan (gated by
    * `spark.sql.sources.v2.bucketing.enabled`; IngestSpec pins the
    * shuffle-free plan). This is the DSv2 face of bucketing: at 100 TB
    * the source's physical layout replaces the aggregation shuffle the
    * way a bucketed table replaces a join shuffle. Reported only while
    * event_type survives column pruning and no aggregate was pushed
    * (a pushed aggregate's rows are already (group, partial) pairs). */
  override def outputPartitioning(): Partitioning =
    if (keyed && agg.isEmpty && readSchema().fieldNames.contains("event_type"))
      new KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .identity("event_type")), SyntheticSource.NumTypes)
    else new UnknownPartitioning(0)

  /** RUNTIME filtering ([[SupportsRuntimeFiltering]]) — the DSv2 face of
    * dynamic partition pruning: when this scan probes a join whose other
    * side is broadcast, Spark evaluates the build side FIRST, translates
    * its distinct join keys into an `In("id", …)` filter, and calls
    * [[filter]] on the executed scan before ([[planInputPartitions]] is
    * re-run and) any reader starts — so a 16-slice scan whose join can
    * only match 5 ids plans the one slice containing them. Partition-
    * granular by design: the contract is best-effort (Spark re-applies
    * the join), so pruning whole slices is sound and row-level work
    * stays in the join where codegen handles it. Declared only for the
    * raw-row scan — a pushed aggregate's output rows are (group,
    * partial) pairs, not id-addressable. */
  private var runtimeIds: Option[Array[Long]] = None

  override def filterAttributes(): Array[NamedReference] =
    if (agg.isEmpty && readSchema().fieldNames.contains("id"))
      Array(org.apache.spark.sql.connector.expressions.Expressions.column("id"))
    else Array.empty

  override def filter(filters: Array[Filter]): Unit =
    filters.foreach {
      case In("id", vals) =>
        runtimeIds = Some(vals.collect { case v: Long => v }.sorted)
      case _ => // best-effort: unusable runtime filters are ignored
    }
  override def description(): String = {
    val base = s"graft-synthetic [$lo, $hi) cols=${readSchema().fieldNames.mkString(",")}"
    val withJoin =
      if (srcOf.isEmpty) base
      else base + " PushedJoin: INNER ON id"
    val withAgg = agg match {
      case Some(a) => withJoin +
        s" PushedAggregates: [${a.calls.map(_.sqlName).mkString(", ")}]" +
        s", PushedGroupByExpressions: [${a.groupCols.mkString(", ")}]"
      case None => withJoin
    }
    if (limitInfo.isEmpty) withAgg
    else withAgg + limitInfo.mkString(" ", ", ", "")
  }
  override def toBatch: Batch = this

  /** The streaming face of the same scan: offsets are positions in the
    * (pushdown-narrowed) id space, each trigger admits up to `batchRows`
    * new ids, and a trigger's [start, end) range splits over the same
    * slice planning as the batch path. The checkpointed offset IS the
    * exactly-once contract: a restarted query resumes from the committed
    * id, and ranges are deterministic functions of offsets. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    // Spark never offers an Aggregation (or limit/offset) to a streaming
    // scan; guard the invariants rather than silently dropping them
    require(agg.isEmpty, "aggregate pushdown is a batch-only contract")
    require(limitInfo.isEmpty, "limit/offset pushdown is a batch-only contract")
    new SyntheticMicroBatchStream(lo, hi, slices, batchRows, required.fieldNames)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    val split =
      if (keyed)
        // one partition per event_type over the (possibly pushdown-
        // narrowed) id range; ids stride by NumTypes inside each
        (0 until SyntheticSource.NumTypes).iterator
          .map(k => SyntheticKeyedPartition(lo, hi, k))
          .collect { case p if p.count > 0 => p: InputPartition }.toArray
      else if (n <= 0) Array.empty[InputPartition]
      else (0 until slices).iterator.map { s =>
        // even split of [lo, hi): slice s gets [lo + s·n/P, lo + (s+1)·n/P)
        SyntheticPartition(lo + s * n / slices, lo + (s + 1) * n / slices, s)
      }.collect { case p if p.hi > p.lo => p: InputPartition }.toArray
    // a GLOBAL pushed aggregate must emit a partial row even over an
    // empty range (SQL: SELECT count(*) FROM empty is one row, 0) —
    // plan one degenerate partition so the zero/null partial exists
    val base =
      if (split.isEmpty && agg.exists(_.groupCols.isEmpty))
        Array[InputPartition](SyntheticPartition(0, 0))
      else split
    // runtime join-key filter: drop every partition containing none of
    // the ids the probe can match (set semantics of In — sound to prune)
    val parts = runtimeIds.fold(base) { ids =>
      base.collect {
        case p: SyntheticPartition if ids.exists(v => v >= p.lo && v < p.hi) =>
          p: InputPartition
        case p: SyntheticKeyedPartition
            if ids.exists(v => v >= p.lo && v < p.hi &&
              v % SyntheticSource.NumTypes == p.k) =>
          p: InputPartition
      }
    }
    SyntheticSource.lastScan = Some(SyntheticSource.ScanInfo(
      lo, hi, readSchema().fieldNames.toSeq, parts.length,
      agg.toSeq.flatMap(_.calls.map(_.sqlName)),
      runtimeIds.map(_.length), limitInfo, pushedJoin = srcOf.nonEmpty))
    parts
  }
  override def createReaderFactory(): PartitionReaderFactory = agg match {
    case Some(a) => SyntheticAggReaderFactory(a)
    case None =>
      // a pushed join's output names map back to their source formulas
      // (readSchema order is preserved — readers emit by position)
      SyntheticReaderFactory(
        required.fieldNames.map(n => srcOf.getOrElse(n, n)), columnar)
  }
}

/** `sliceIdx` is the planning-time ordinal served by the `_slice`
  * metadata column; stable under runtime-filter pruning (assigned at
  * split, not renumbered), -1 on paths that never serve metadata
  * (streaming, the degenerate empty-scan partition). */
case class SyntheticPartition(lo: Long, hi: Long, sliceIdx: Int = -1)
    extends InputPartition

/** One event_type's rows of [lo, hi): ids ≡ k (mod NumTypes). Carries
  * its key ([[HasPartitionKey]]) so Spark can group/sort partitions by
  * value — the half of the storage-partitioned contract the engine
  * needs to trust [[KeyGroupedPartitioning]]. */
case class SyntheticKeyedPartition(lo: Long, hi: Long, k: Int)
    extends InputPartition with HasPartitionKey {
  /** Smallest id ≥ lo with id mod NumTypes = k. */
  def first: Long = {
    val m = SyntheticSource.NumTypes
    lo + ((k - lo % m + m) % m)
  }
  def count: Long =
    if (hi <= first) 0L
    else (hi - first + SyntheticSource.NumTypes - 1) / SyntheticSource.NumTypes
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString("t" + k)))
}

/** Offset = position in the id space (json-serialized into the
  * streaming checkpoint like any production source's offset log). */
case class IdOffset(id: Long) extends Offset {
  override def json(): String = id.toString
}

/** STATELESS admission: Spark hands `latestOffset(start, limit)` the
  * last committed offset, so the next batch is a pure function of the
  * checkpoint — a restart (even against a source that has since grown)
  * resumes exactly at the committed id with nothing re-read and nothing
  * skipped. This is the [[SupportsAdmissionControl]] contract real rate-
  * limited sources (Kafka's maxOffsetsPerTrigger) implement; a mutable
  * driver-side cursor is NOT recovery-safe, because the engine may probe
  * for availability before the offset log has been replayed. */
class SyntheticMicroBatchStream(lo: Long, hi: Long, slices: Int,
    batchRows: Long, columns: Array[String])
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = IdOffset(lo)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchRows)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[IdOffset].id
    val step = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _ => batchRows
    }
    IdOffset(math.min(math.max(s, lo) + step, hi))
  }
  override def reportLatestOffset(): Offset = IdOffset(hi)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "graft synthetic stream is admission-controlled; " +
        "latestOffset(start, limit) is the only valid form")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[IdOffset].id
    val e = end.asInstanceOf[IdOffset].id
    SyntheticSource.plannedBatches.add((s, e))
    val n = e - s
    if (n <= 0) Array.empty
    else (0 until slices).iterator.map { k =>
      SyntheticPartition(s + k * n / slices, s + (k + 1) * n / slices)
    }.collect { case p if p.hi > p.lo => p: InputPartition }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    SyntheticReaderFactory(columns, columnar = false)
  override def deserializeOffset(json: String): Offset = IdOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class SyntheticReaderFactory(columns: Array[String], columnar: Boolean)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    // keyed partitions stride NumTypes; plain slices stride 1
    val (start, limit, stride, slice) = partition match {
      case p: SyntheticPartition => (p.lo, p.hi, 1L, p.sliceIdx)
      case p: SyntheticKeyedPartition =>
        (p.first, p.hi, SyntheticSource.NumTypes.toLong, p.k)
    }
    require(slice >= 0 ||
      !columns.contains(SyntheticSource.SliceColName),
      "_slice requested on a partition planned without an ordinal")
    new PartitionReader[InternalRow] {
      private var id = start - stride
      override def next(): Boolean = { id += stride; id < limit }
      override def get(): InternalRow =
        new GenericInternalRow(columns.map[Any] {
          case "id" => id
          case "user_id" => SyntheticSource.userId(id)
          case "value_cents" => SyntheticSource.valueCents(id)
          case "event_type" => UTF8String.fromString(SyntheticSource.eventType(id))
          case SyntheticSource.SliceColName => slice
          case other => throw new IllegalArgumentException(s"no column $other")
        })
      override def close(): Unit = ()
    }
  }

  /** The VECTORIZED read path (`columnar=true`): the connector hands
    * Spark [[ColumnarBatch]]es of [[OnHeapColumnVector]]s instead of one
    * row at a time — the parquet-reader shape. Spark inserts a single
    * `ColumnarToRow` transition that feeds whole-stage codegen straight
    * from the vectors (no per-row object allocation, no per-row virtual
    * `get()` call), which is what keeps wide scans CPU-bound instead of
    * allocation-bound at 100 TB. Results are bitwise-identical to the
    * row path (IngestSpec proves both, plus the plan's ColumnarToRow). */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    columnar && partition.isInstanceOf[SyntheticPartition] // keyed → row path

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
    val p = partition.asInstanceOf[SyntheticPartition]
    val VecRows = 4096
    new PartitionReader[ColumnarBatch] {
      private var pos = p.lo
      private var batch: ColumnarBatch = _
      override def next(): Boolean = {
        if (batch != null) { batch.close(); batch = null }
        if (pos >= p.hi) false
        else {
          val n = math.min(VecRows.toLong, p.hi - pos).toInt
          val vecs = columns.map {
            case "event_type" => new OnHeapColumnVector(n, StringType)
            case SyntheticSource.SliceColName =>
              new OnHeapColumnVector(n, org.apache.spark.sql.types.IntegerType)
            case _ => new OnHeapColumnVector(n, LongType)
          }
          var i = 0
          while (i < n) {
            val id = pos + i
            var j = 0
            while (j < columns.length) {
              columns(j) match {
                case "id" => vecs(j).putLong(i, id)
                case "user_id" => vecs(j).putLong(i, SyntheticSource.userId(id))
                case "value_cents" =>
                  vecs(j).putLong(i, SyntheticSource.valueCents(id))
                case "event_type" =>
                  val b = SyntheticSource.eventType(id)
                    .getBytes(java.nio.charset.StandardCharsets.UTF_8)
                  vecs(j).putByteArray(i, b, 0, b.length)
                case SyntheticSource.SliceColName =>
                  require(p.sliceIdx >= 0,
                    "_slice requested on a partition planned without an ordinal")
                  vecs(j).putInt(i, p.sliceIdx)
                case other =>
                  throw new IllegalArgumentException(s"no column $other")
              }
              j += 1
            }
            i += 1
          }
          batch = new ColumnarBatch(vecs.map(v => v: ColumnVector), n)
          pos += n
          true
        }
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit =
        if (batch != null) { batch.close(); batch = null }
    }
  }
}

/** Reader for a scan with a pushed (partial) aggregation: streams the
  * partition's id range ONCE through a per-group state table and emits
  * one row per surviving group — the source-side half of a map-side
  * combine. Memory is O(distinct groups in this partition), the same
  * bound Spark's own partial hash aggregate has (bounded here by
  * construction: user_id < 1000, event_type 5 values; a general
  * connector would spill or refuse the pushdown for unbounded keys).
  * Group keys keep raw JVM values (Long/String) until emission, then
  * convert to internal form (UTF8String) exactly once per output row. */
case class SyntheticAggReaderFactory(agg: SyntheticSource.PushedAgg)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SyntheticPartition]
    new PartitionReader[InternalRow] {
      private var it: Iterator[InternalRow] = _
      private var cur: InternalRow = _

      private def valueOf(col: String, id: Long): Any = col match {
        case "id" => id
        case "user_id" => SyntheticSource.userId(id)
        case "value_cents" => SyntheticSource.valueCents(id)
        case "event_type" => SyntheticSource.eventType(id)
        case other => throw new IllegalArgumentException(s"no column $other")
      }

      /** state(i) for calls(i): count → Long; sum → Long (valid iff
        * seen); min/max → Any (valid iff seen); seen tracks the
        * zero-row global group, whose sum/min/max are null. */
      private def compute(): Iterator[InternalRow] = {
        val groups = scala.collection.mutable.LinkedHashMap
          .empty[List[Any], (Array[Long], Array[Any], Array[Boolean])]
        def newState() = (Array.fill(agg.calls.length)(0L),
          Array.fill[Any](agg.calls.length)(null),
          Array.fill(agg.calls.length)(false))
        if (agg.groupCols.isEmpty) groups(Nil) = newState()
        var id = p.lo
        while (id < p.hi) {
          val key = agg.groupCols.map(c => valueOf(c, id)).toList
          val (longs, anys, seen) = groups.getOrElseUpdate(key, newState())
          var i = 0
          while (i < agg.calls.length) {
            val call = agg.calls(i)
            call.op match {
              case "count" => longs(i) += 1L
              case "sum" => longs(i) += valueOf(call.col.get, id)
                .asInstanceOf[Long]
              case "min" | "max" =>
                val v = valueOf(call.col.get, id)
                val better = !seen(i) || ((v, anys(i)) match {
                  case (a: Long, b: Long) =>
                    if (call.op == "min") a < b else a > b
                  case (a: String, b: String) =>
                    if (call.op == "min") a < b else a > b
                  case _ => false
                })
                if (better) anys(i) = v
            }
            seen(i) = true
            i += 1
          }
          id += 1
        }
        groups.iterator.map { case (key, (longs, anys, seen)) =>
          val out = new Array[Any](agg.groupCols.length + agg.calls.length)
          var j = 0
          key.foreach { v => out(j) = toInternal(v); j += 1 }
          var i = 0
          while (i < agg.calls.length) {
            out(j) = agg.calls(i).op match {
              case "count" => longs(i)
              case "sum" => if (seen(i)) longs(i) else null
              case _ => if (seen(i)) toInternal(anys(i)) else null
            }
            i += 1; j += 1
          }
          new GenericInternalRow(out)
        }
      }

      private def toInternal(v: Any): Any = v match {
        case s: String => UTF8String.fromString(s)
        case other => other
      }

      override def next(): Boolean = {
        if (it == null) it = compute()
        if (it.hasNext) { cur = it.next(); true } else false
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
