package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** |A ∩ B| for two SORTED, DISTINCT arrays via a linear merge — same
  * value as `size(array_intersect(a, b))` on such inputs, but
  * allocation-free: `array_intersect` builds a fresh hash set and output
  * array per row, which dominates candidate-pair verification in LSH
  * dedup (millions of pairs × ~60-element arrays).
  *
  * Supports `array<bigint>` (primitive merge, zero allocation — preferred:
  * hash tokens first) and `array<string>` (UTF8String binary compare).
  *
  * Caller contract: both arrays ascending (`array_sort` order) and
  * duplicate-free (`array_distinct`).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_size"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckSuccess
      case (l, r) => TypeCheckFailure(
        s"$prettyName requires two array<bigint> or two array<string> arguments, got ($l, $r)")
    }
  }

  private lazy val isLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  /** `array_sort` places null elements LAST, and null never equals
    * anything — so on the sorted-input contract, hitting a null on either
    * side ends the merge. The guard is only emitted when a child's
    * ArrayType admits nulls. */
  private lazy val anyNullableElements: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, n) => n
      case _ => false
    })

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0L
    var na = a.numElements(); var nb = b.numElements()
    if (anyNullableElements) {
      // nulls sort last: truncate to the non-null prefix
      while (na > 0 && a.isNullAt(na - 1)) na -= 1
      while (nb > 0 && b.isNullAt(nb - 1)) nb -= 1
    }
    if (isLong) {
      while (i < na && j < nb) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    } else {
      while (i < na && j < nb) {
        val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val body = if (isLong) {
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
           |long $x = $a.getLong($i); long $y = $b.getLong($j);
           |if ($x == $y) { ${ev.value}++; $i++; $j++; }
           |else if ($x < $y) { $i++; } else { $j++; }
         """.stripMargin
      } else {
        val cmp = ctx.freshName("cmp")
        s"""
           |int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
           |if ($cmp == 0) { ${ev.value}++; $i++; $j++; }
           |else if ($cmp < 0) { $i++; } else { $j++; }
         """.stripMargin
      }
      val trim =
        if (anyNullableElements)
          s"""
             |while ($na > 0 && $a.isNullAt($na - 1)) $na--;
             |while ($nb > 0 && $b.isNullAt($nb - 1)) $nb--;
           """.stripMargin
        else ""
      s"""
         |int $i = 0, $j = 0;
         |int $na = $a.numElements(), $nb = $b.numElements();
         |$trim
         |${ev.value} = 0L;
         |while ($i < $na && $j < $nb) {
         |  $body
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  /** Column-API entry point; inputs must be sorted + distinct. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectSize(Bridge.expression(a), Bridge.expression(b)))
}
