package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast,
  EvalMode, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable,
  NumericEvalContext, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

import graft.functions.LongDotProduct

/** Optimizer rule: rewrite the composable dot-product shape
  *
  *   `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)`
  *
  * over two `array<bigint>` columns into the fused codegen
  * [[LongDotProduct]] (strict mode). Both HOFs are CodegenFallback —
  * every row pays interpreted lambda calls plus an intermediate array —
  * so a user writing the idiomatic SQL/DataFrame form silently gets the
  * native loop, the same way Catalyst's own ReplaceExpressions swaps
  * declarative forms for runnable ones. Registered by
  * [[graft.functions.GraftExtensions]] (`spark.sql.extensions`) next to
  * the function registrations.
  *
  * Strictly semantics-preserving: the rewrite targets STRICT mode,
  * which reproduces the HOF form's null discipline exactly (zip_with
  * null-pads a length mismatch and the Add chain propagates any null
  * element → NULL result). Guards: element multiply and accumulate are
  * plain LEGACY-mode long arithmetic over the lambda's own variables,
  * the zero is a long 0, and the finish lambda is identity —
  * anything else is left untouched.
  */
object RewriteLongDot extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  private def isZeroLong(e: Expression): Boolean = e match {
    case Literal(0L, LongType) => true
    case c: Cast if c.dataType == LongType => c.child match {
      case Literal(v: Int, IntegerType) => v == 0
      case Literal(0L, LongType) => true
      case _ => false
    }
    case _ => false
  }

  private def sameVars(p: (NamedLambdaVariable, NamedLambdaVariable),
      args: Seq[Expression]): Boolean = args match {
    case Seq(x: NamedLambdaVariable, y: NamedLambdaVariable) =>
      Set(p._1.exprId, p._2.exprId) == Set(x.exprId, y.exprId)
    case _ => false
  }

  /** Spark 4 arithmetic carries a NumericEvalContext; only LEGACY-mode
    * (non-ANSI) ops match — ANSI adds overflow raises the fused loop
    * does not reproduce. */
  private def legacy(ctx: NumericEvalContext): Boolean =
    ctx.evalMode == EvalMode.LEGACY

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(ml: NamedLambdaVariable,
              mr: NamedLambdaVariable, mulCtx), zipArgs, _)),
          zero,
          LambdaFunction(Add(al: NamedLambdaVariable,
            ar: NamedLambdaVariable, addCtx), mergeArgs, _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
        if legacy(mulCtx) && legacy(addCtx) &&
          isLongArray(a) && isLongArray(b) && isZeroLong(zero) &&
          sameVars((ml, mr), zipArgs) && sameVars((al, ar), mergeArgs) &&
          fin.exprId == fv.exprId =>
        LongDotProduct(a, b, strict = true)
    }
}
