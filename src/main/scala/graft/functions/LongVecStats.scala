package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Elementwise vector statistics — `vec_stats(array<bigint>)` returns
  * one struct of three position-indexed arrays per group:
  *
  *   sums(p) = Σ x(p) over rows whose array is long enough and non-null
  *             at p (0 when nn(p) = 0 — guard with nn),
  *   rows(p) = COUNT of rows whose array covers position p (null
  *             elements included — they cover the position),
  *   nn(p)   = COUNT of rows with a NON-NULL element at p.
  *
  * This is the Lloyd-update mean's input, computed WITHOUT the
  * posexplode the previous shape paid: `posexplode(v) → groupBy(key,
  * pos) → groupBy(key)` pushes dims× the corpus row count through TWO
  * hash aggregates and an exchange keyed dims× wider. As a
  * [[TypedImperativeAggregate]] the partial-aggregation contract
  * applies: each map task folds its slice into K buffers of 3·dims
  * longs before the exchange, so the shuffle moves O(groups) structs
  * instead of O(input·dims) rows and the agg hash map is touched once
  * per ROW, not once per element — at 100 TB the difference between a
  * dims×-corpus shuffle stage and a model-sized one.
  *
  * Exactness: long additions are commutative/associative (wrapping on
  * overflow exactly like Spark's own non-ANSI `sum(bigint)`), so the
  * result is bit-identical to the posexplode form for any execution
  * order — ExpressionSpec pins the equivalence on ragged/null/empty
  * corners. Ragged arrays are supported (positions covered only by the
  * rows long enough to reach them); a NULL input array contributes
  * nothing.
  */
case class LongVecStats(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongVecStats.Buffer] {

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LongVecStats =
    copy(child = newChildren(0))
  override def withNewMutableAggBufferOffset(newOffset: Int): LongVecStats =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongVecStats =
    copy(inputAggBufferOffset = newOffset)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckSuccess
      case t => TypeCheckFailure(
        s"$prettyName requires array<bigint> input, got $t")
    }
  }
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("rows", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("nn", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "vec_stats"

  override def createAggregationBuffer(): LongVecStats.Buffer =
    new LongVecStats.Buffer

  override def update(buf: LongVecStats.Buffer, input: InternalRow)
      : LongVecStats.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      buf.ensure(n)
      var p = 0
      while (p < n) {
        buf.rows(p) += 1L
        if (!arr.isNullAt(p)) {
          buf.sums(p) += arr.getLong(p)
          buf.nn(p) += 1L
        }
        p += 1
      }
    }
    buf
  }

  override def merge(buf: LongVecStats.Buffer,
      other: LongVecStats.Buffer): LongVecStats.Buffer = {
    buf.ensure(other.len)
    var p = 0
    while (p < other.len) {
      buf.sums(p) += other.sums(p)
      buf.rows(p) += other.rows(p)
      buf.nn(p) += other.nn(p)
      p += 1
    }
    buf
  }

  override def eval(buf: LongVecStats.Buffer): Any =
    new GenericInternalRow(Array[Any](
      new GenericArrayData(java.util.Arrays.copyOf(buf.sums, buf.len)),
      new GenericArrayData(java.util.Arrays.copyOf(buf.rows, buf.len)),
      new GenericArrayData(java.util.Arrays.copyOf(buf.nn, buf.len))))

  override def serialize(buf: LongVecStats.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 24 * buf.len)
    bb.putInt(buf.len)
    var p = 0
    while (p < buf.len) {
      bb.putLong(buf.sums(p)); bb.putLong(buf.rows(p)); bb.putLong(buf.nn(p))
      p += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongVecStats.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new LongVecStats.Buffer
    buf.ensure(n)
    var p = 0
    while (p < n) {
      buf.sums(p) = bb.getLong; buf.rows(p) = bb.getLong; buf.nn(p) = bb.getLong
      p += 1
    }
    buf
  }
}

object LongVecStats {
  /** Growable position-indexed triple; `len` is the max array length
    * seen so far (ragged inputs extend it). */
  final class Buffer {
    var len: Int = 0
    var sums: Array[Long] = Array.emptyLongArray
    var rows: Array[Long] = Array.emptyLongArray
    var nn: Array[Long] = Array.emptyLongArray
    def ensure(n: Int): Unit = {
      if (n > sums.length) {
        val cap = math.max(n, math.max(8, sums.length * 2))
        sums = java.util.Arrays.copyOf(sums, cap)
        rows = java.util.Arrays.copyOf(rows, cap)
        nn = java.util.Arrays.copyOf(nn, cap)
      }
      if (n > len) len = n
    }
  }

  /** Column-API form: `df.groupBy(g).agg(vecStats(v).as("st"))`. */
  def vecStats(v: Column): Column =
    Bridge.column(LongVecStats(Bridge.expression(v)).toAggregateExpression())
}
