package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference,
  EqualTo, Expression, GreaterThanOrEqual}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.types.{StructType, TimestampType}

/** `ASOF JOIN` SQL syntax — the parser extension point
  * (`SparkSessionExtensions.injectParser`), completing the set next to
  * the expression/aggregate/generator, optimizer-rule, planner-strategy
  * and DSv2 surfaces. DuckDB spells the same operator `ASOF JOIN`
  * natively, which is exactly what makes it oracle-checkable.
  *
  * Supported grammar (the DuckDB/canonical backward as-of form):
  *
  * {{{ <left> ASOF JOIN <right relation> ON l.key = r.key AND l.time >= r.time }}}
  *
  * where the ON operands are column references. Output = the LEFT
  * relation's columns plus `asof_t` (the matched right time; NULL when
  * no right row qualifies — filter `asof_t IS NOT NULL` for the inner
  * form). The key equality may be written in either column order; the
  * time inequality must put the left (probe) time first — the reversed
  * inequality is a *forward* as-of, which [[AsOfMergeJoinExec]] does not
  * implement, and [[AsOfJoinStrategy]] rejects it at plan time rather
  * than silently flipping semantics.
  *
  * Implementation: Spark's ANTLR grammar is not extensible at runtime,
  * so custom syntax must parse BEFORE delegation — the standard
  * injectParser pattern is rewrite-then-delegate. The rewrite turns
  * `ASOF JOIN … ON c` into `JOIN … ON graft_asof_marker(c)` (pure text,
  * one regex whose shape IS the supported grammar), the delegate parser
  * builds the ordinary unresolved [[Join]], and the marker join is
  * lowered to the custom [[AsOfJoin]] logical node before the plan
  * leaves `parsePlan` — the analyzer never sees the marker, and
  * everything downstream (resolution, optimization, planning via
  * [[AsOfJoinStrategy]], execution via [[AsOfMergeJoinExec]]) is the
  * exact path the DataFrame-side [[AsOfJoinOp]] takes. One plan, two
  * front ends. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    if (AsofRe.findFirstIn(sqlText).isDefined)
      lower(delegate.parsePlan(rewrite(sqlText)))
    else delegate.parsePlan(sqlText)

  /** Parameterized SQL (`spark.sql(text, args)`) routes through THIS
    * entry point since Spark 4.1 — it is a DEFAULT interface method, so
    * a delegating wrapper that doesn't override it silently swaps the
    * real parser's parameter threading for the parameter-less default
    * and every bind dies with UNBOUND_SQL_PARAMETER (found the hard
    * way; EntrySpec pins binds-with-extensions). Same ASOF rewrite
    * treatment as parsePlan. */
  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    if (AsofRe.findFirstIn(sqlText).isDefined)
      lower(delegate.parsePlanWithParameters(rewrite(sqlText), ctx))
    else delegate.parsePlanWithParameters(sqlText, ctx)

  // views/CTEs parse through parseQuery — same treatment
  override def parseQuery(sqlText: String): LogicalPlan =
    if (AsofRe.findFirstIn(sqlText).isDefined)
      lower(delegate.parseQuery(rewrite(sqlText)))
    else delegate.parseQuery(sqlText)

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  /** Marker function name; never registered — it must not survive
    * lowering, and [[lower]] throws if the ON shape kept it unmatched. */
  val Marker = "graft_asof_marker"

  /** The grammar, as a regex: relation (+ optional alias), then the
    * two-conjunct ON. Column refs only — the rewrite is deliberately
    * narrow so anything outside the documented contract falls through to
    * the delegate parser and fails with ITS error, not a silent
    * mis-rewrite. */
  private val AsofRe =
    """(?is)\bASOF\s+JOIN\s+(.+?)\s+ON\s+([\w.]+)\s*=\s*([\w.]+)\s+AND\s+([\w.]+)\s*>=\s*([\w.]+)""".r

  private def rewrite(sql: String): String =
    AsofRe.replaceAllIn(sql, m =>
      scala.util.matching.Regex.quoteReplacement(
        s"JOIN ${m.group(1)} ON $Marker(${m.group(2)} = ${m.group(3)} " +
          s"AND ${m.group(4)} >= ${m.group(5)})"))

  private def lower(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case Join(l, r, Inner, Some(u: UnresolvedFunction), _)
        if u.nameParts.map(_.toLowerCase) == Seq(Marker) =>
      u.arguments match {
        case Seq(And(EqualTo(lk, rk), GreaterThanOrEqual(lt, rt))) =>
          AsOfJoin(l, r, lk, rk, lt, rt,
            AttributeReference("asof_t", TimestampType)())
        case other => throw new IllegalArgumentException(
          s"ASOF JOIN ON must be `l.key = r.key AND l.time >= r.time`, got $other")
      }
  }
}
