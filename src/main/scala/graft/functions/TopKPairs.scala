package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Bounded top-k aggregate — `topk_pairs(score, id, k)` keeps the k
  * largest `(score, id)` pairs per group (score DESC, id ASC tie-break)
  * and returns them as a sorted `array<struct<score,id>>`.
  *
  * WHY an aggregate and not a window: `row_number() OVER (PARTITION BY g
  * ORDER BY s DESC) <= k` shuffles and sorts EVERY row to its group's
  * partition before discarding all but k. As a [[TypedImperativeAggregate]]
  * the partial-aggregation contract applies: each map task reduces its
  * slice to ≤ k pairs per group BEFORE the exchange, so the shuffle
  * moves O(groups × k) rows instead of O(input) — at 100 TB that is the
  * difference between a full-data sort-shuffle and a metadata-sized one.
  * (Spark's own `WindowGroupLimit` rule closes some of this gap for
  * windows, but still shuffles every surviving row; the aggregate form
  * combines map-side.)
  *
  * The buffer is a sorted bounded buffer (insertion sort — k is small by
  * contract); serialization is a flat little-endian `[n, score₀, id₀, …]`
  * frame for the partial/final exchange. Longs only, so the result is
  * exact and hash-oracled (the oracle replays it as a row_number window
  * in DuckDB).
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Long)]] {

  require(k > 0, s"topk_pairs needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1))
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (score.dataType == LongType && id.dataType == LongType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName requires (bigint, bigint) inputs, " +
      s"got (${score.dataType}, ${id.dataType})")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_pairs"

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] =
    new ArrayBuffer[(Long, Long)](k + 1)

  /** (s1,i1) ranks strictly ahead of (s2,i2). */
  @inline private def ahead(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  /** Bounded sorted insert: no-op fast path when the candidate can't
    * place; insertion sort otherwise (k is small by contract). */
  private def insert(buf: ArrayBuffer[(Long, Long)], s: Long, i: Long): Unit = {
    if (buf.size >= k && !ahead(s, i, buf.last._1, buf.last._2)) return
    var pos = buf.size
    while (pos > 0 && ahead(s, i, buf(pos - 1)._1, buf(pos - 1)._2)) pos -= 1
    buf.insert(pos, (s, i))
    if (buf.size > k) buf.remove(buf.size - 1)
  }

  override def update(buf: ArrayBuffer[(Long, Long)], input: InternalRow)
      : ArrayBuffer[(Long, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      insert(buf, s.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: ArrayBuffer[(Long, Long)],
      other: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    other.foreach { case (s, i) => insert(buf, s, i) }
    buf
  }

  override def eval(buf: ArrayBuffer[(Long, Long)]): Any =
    new GenericArrayData(buf.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i)): Any
    }.toArray)

  override def serialize(buf: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putLong(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Long, Long)](math.max(n, k) + 1)
    var j = 0
    while (j < n) { buf += ((bb.getLong, bb.getLong)); j += 1 }
    buf
  }
}

object TopKPairs {
  /** Column-API form: `df.groupBy(g).agg(topkPairs(s, i, 3).as("top"))`. */
  def topkPairs(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKPairs(
      Bridge.expression(score), Bridge.expression(id), k)
      .toAggregateExpression())
}
