package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** AS-OF JOIN as a first-class operator — the custom-LogicalPlan +
  * Strategy + SparkPlan extension path (the one whole-operator semantics
  * Spark's own surface lacks; DuckDB spells it `ASOF JOIN`).
  *
  * Semantics: for each left row, the LARGEST right time ≤ the left time
  * among right rows with the same key (inclusive; the standard trade
  * "price as of the order" join). Unmatched left rows emit a NULL
  * `asof_t` — the caller picks inner (filter) or left semantics.
  *
  * Why a physical operator when [[graft.ops.EventOps.asofLastOrder]]
  * already expresses the same result relationally: the union+window form
  * pays a per-key SORT of the UNION of both inputs and materializes a
  * window frame; the merge exec consumes the two inputs' existing
  * (key, time) sort orders directly — one pass, zero buffering (the
  * matched time is a single long of state; no row is ever copied or
  * held). Same shuffle count (one per side, inserted by
  * EnsureRequirements against the declared distribution/ordering
  * requirements), strictly less sorting — and the declarative
  * requirements mean Catalyst still plans the exchanges, reuses
  * existing orderings, and AQE still coalesces partitions.
  *
  * Contract (checked at construction): the key expressions are
  * `LongType`, the time expressions `TimestampType` (micros-as-long
  * internally). NULL keys or times never match (left null → null
  * `asof_t`; right null rows are discarded), mirroring the engine rule
  * that ASOF equality never matches NULL.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    asofAttr: AttributeReference)
  extends BinaryNode {
  // the SQL path ([[GraftSqlParser]]) constructs this node with
  // UNRESOLVED attributes (dataType would throw); the checks re-run on
  // every analyzer copy, so the final resolved instance still validates
  private def typeOk(e: Expression, t: org.apache.spark.sql.types.DataType) =
    !e.resolved || e.dataType == t
  require(typeOk(leftKey, LongType) && typeOk(rightKey, LongType),
    s"as-of keys must be LongType, got $leftKey/$rightKey")
  require(typeOk(leftTime, TimestampType) && typeOk(rightTime, TimestampType),
    s"as-of times must be TimestampType, got $leftTime/$rightTime")

  override def output: Seq[Attribute] = left.output :+ asofAttr

  // asof_t originates HERE (like a Generator's output): without this it
  // counts as a reference and trips MISSING_ATTRIBUTES in CheckAnalysis
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofAttr)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] into [[AsOfMergeJoinExec]]; inject via
  * `spark.experimental.extraStrategies` ([[graft.functions.GraftFunctions
  * .register]]) or `SparkSessionExtensions.injectPlannerStrategy`
  * ([[graft.functions.GraftExtensions]]). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk0, rk0, lt, rt, out) =>
      // the SQL path writes the key equality in either order (equality
      // is symmetric, so normalizing here is safe); the TIME inequality
      // is NOT symmetric — `l.t >= r.t` is the backward as-of this
      // operator implements, `r.t >= l.t` would be a forward as-of —
      // so a swapped time side is an error, never a silent swap
      val (lk, rk) =
        if (lk0.references.subsetOf(l.outputSet)) (lk0, rk0) else (rk0, lk0)
      require(lk.references.subsetOf(l.outputSet) &&
        rk.references.subsetOf(r.outputSet),
        s"ASOF key equality must relate one column per side: $lk0 = $rk0")
      require(lt.references.subsetOf(l.outputSet) &&
        rt.references.subsetOf(r.outputSet),
        "only backward ASOF is supported: the time condition must be " +
          s"<left>.time >= <right>.time, got $lt >= $rt")
      AsOfMergeJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, out) :: Nil
    case _ => Nil
  }
}

/** Column-name-level constructor: `AsOfJoinOp(left, "k", "t", right,
  * "rk", "rt")` → left's columns plus `asof_t` (the matched right time,
  * NULL when no right row qualifies). Registers [[AsOfJoinStrategy]] on
  * the session idempotently — callers need no builder config. */
object AsOfJoinOp {
  /** Idempotent strategy registration. Synchronized on the session's
    * `ExperimentalMethods` instance: two concurrent first calls would
    * otherwise both pass the contains-check and append the strategy
    * twice (harmless but avoidable; the extensions path
    * [[graft.functions.GraftExtensions]] has no such race). */
  def registerStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }

  def apply(left: org.apache.spark.sql.DataFrame, leftKey: String,
      leftTime: String, right: org.apache.spark.sql.DataFrame,
      rightKey: String, rightTime: String): org.apache.spark.sql.DataFrame = {
    val spark = left.sparkSession
    AsOfJoinOp.registerStrategy(spark)
    def attr(df: org.apache.spark.sql.DataFrame, name: String): Attribute = {
      val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.analyzed
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(",")}"))
    }
    val lPlan = left.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
    val rPlan = right.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark,
      AsOfJoin(lPlan, rPlan,
        attr(left, leftKey), attr(right, rightKey),
        attr(left, leftTime), attr(right, rightTime),
        AttributeReference("asof_t", TimestampType)()))
  }
}

/** Sorted-merge as-of join: both children hash-clustered on the key and
  * sorted by (key, time) — DECLARED, so EnsureRequirements inserts the
  * exchanges/sorts only where the existing layout doesn't already
  * satisfy them — then each co-partition pair merges in one pass with
  * O(1) state (the current key's latest right time). */
case class AsOfMergeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    asofAttr: AttributeReference)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ asofAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) :: Nil

  // one left row in, one row out, in left order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyTime = (leftKey, leftTime)
    val rKeyTime = (rightKey, rightTime)
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(Seq(lKeyTime._1, lKeyTime._2), lOut)
      val rProj = UnsafeProjection.create(Seq(rKeyTime._1, rKeyTime._2), rOut)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val matchRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      // right cursor state: current head's (key, time), validity
      var rHasHead = false
      var rKey = 0L
      var rTime = 0L
      def advanceRight(): Unit = {
        rHasHead = false
        while (!rHasHead && rIter.hasNext) {
          val kt = rProj(rIter.next())
          // null key/time rows can never be an as-of match: discard
          if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
            rKey = kt.getLong(0); rTime = kt.getLong(1); rHasHead = true
          }
        }
      }
      advanceRight()
      var curKey = 0L
      var curKeyValid = false
      var lastTime = 0L
      var hasLast = false
      lIter.map { lRow =>
        val kt = lProj(lRow)
        if (kt.isNullAt(0) || kt.isNullAt(1)) {
          matchRow.setNullAt(0) // NULL key/time never matches
        } else {
          val lk = kt.getLong(0)
          val lt = kt.getLong(1)
          if (!curKeyValid || curKey != lk) {
            curKey = lk; curKeyValid = true; hasLast = false
          }
          // consume right rows that are (a) for earlier keys, or (b) for
          // this key at/before the left time — (b) updates the match
          var go = rHasHead
          while (go) {
            if (rKey < lk) advanceRight()
            else if (rKey == lk && rTime <= lt) {
              lastTime = rTime; hasLast = true; advanceRight()
            } else go = false
            if (!rHasHead) go = false
          }
          if (hasLast) matchRow.setLong(0, lastTime) else matchRow.setNullAt(0)
        }
        outProj(joined(lRow, matchRow))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)
}
