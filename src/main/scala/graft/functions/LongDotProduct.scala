package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact integer dot product of two `array<bigint>` columns.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0L, _+_)` —
  * allocates an intermediate array and evaluates two lambda closures per
  * row (both HOFs are CodegenFallback), which dominates the brute-force
  * similarity scans. This native Expression generates a tight fused loop
  * inside WholeStageCodegen: no allocation, no virtual calls, exact
  * int64 arithmetic.
  *
  * Two null disciplines:
  *   - `strict = false` (the Column-API default, used by the vector
  *     ops): truncate to the shorter length, skip null pairs — the
  *     robust form for caller-controlled equal-length embeddings.
  *   - `strict = true` (what [[graft.plans.RewriteLongDot]] targets):
  *     bit-faithful to the composable HOF form — a length mismatch or
  *     any null element yields NULL, exactly like zip_with's null
  *     padding and Add/Multiply's null propagation. A rewrite RULE must
  *     preserve semantics on every input, so it only ever produces this
  *     mode.
  */
case class LongDotProduct(left: Expression, right: Expression,
    strict: Boolean = false)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  override def nullable: Boolean = strict || super.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    import org.apache.spark.sql.types.ArrayType
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckSuccess
      case (l, r) => TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got ($l, $r)")
    }
  }

  /** Null elements contribute 0 (the pair is skipped). The guard is only
    * emitted when a child's ArrayType admits nulls, so non-null-element
    * producers keep the unguarded tight loop. */
  private lazy val anyNullableElements: Boolean =
    Seq(left, right).exists(_.dataType match {
      case org.apache.spark.sql.types.ArrayType(_, n) => n
      case _ => false
    })

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (strict) {
      if (a.numElements() != b.numElements()) return null
      var acc = 0L
      var i = 0
      val n = a.numElements()
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += a.getLong(i) * b.getLong(i)
        i += 1
      }
      acc
    } else {
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0L
      var i = 0
      if (anyNullableElements) {
        while (i < n) {
          if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getLong(i) * b.getLong(i)
          i += 1
        }
      } else {
        while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      if (strict) {
        // HOF-faithful: length mismatch or any null element → NULL
        s"""
           |${ev.value} = 0L;
           |if ($a.numElements() != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $n = $a.numElements();
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    ${ev.value} += $a.getLong($i) * $b.getLong($i);
           |  }
           |}
         """.stripMargin
      } else {
        val add = s"${ev.value} += $a.getLong($i) * $b.getLong($i);"
        val body =
          if (anyNullableElements)
            s"if (!$a.isNullAt($i) && !$b.isNullAt($i)) { $add }"
          else add
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |${ev.value} = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $body
           |}
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongDotProduct {
  /** Column-API entry point. */
  def longDot(a: Column, b: Column): Column =
    Bridge.column(LongDotProduct(Bridge.expression(a), Bridge.expression(b)))
}
