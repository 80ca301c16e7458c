package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Exact distinct counting as a mergeable BITMAP aggregate — the
  * exact-answer sibling of [[KmvSketch]] (approximate) in the
  * mergeable-summaries family. The buffer is a dense bitset over the
  * key domain; update = set a bit, merge = bitwise OR, eval =
  * popcount. All three are order- and partitioning-invariant, so the
  * count is exact under any merge tree, AQE re-plan or cluster size.
  *
  * Why this beats `count(distinct x)` at 100 TB: the built-in plans
  * an Expand + a shuffle of every DISTINCT (group, value) pair,
  * while the bitmap aggregates map-side into a fixed-size state and
  * ships ONE buffer per (partition, group) — the same reason
  * warehouses grow `bitmap_count_distinct`. The dense bitset is the
  * right container for the suite's surrogate-key domains
  * (sequential TPC-H keys); sparse/high domains would swap in
  * roaring-style compressed containers behind the same
  * update/or/popcount contract — the aggregate's interface (and this
  * query's plan shape) would not change.
  *
  * The domain cap is a hard guard, not a truncation: a key outside
  * [0, maxBits) fails the query loudly (the [[graft.queries.Geo]]
  * packing-headroom discipline) instead of silently folding into a
  * wrong bit.
  */
case class BitmapDistinct(
    child: Expression,
    maxBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.BitSet]
  with UnaryLike[Expression] {

  require(
    maxBits >= 1 && maxBits <= (1 << 27),
    s"bitmap_distinct domain cap must be in [1, 2^27] bits (16 MiB), got $maxBits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap_distinct expects an integer key column, got $other")
  }

  override def createAggregationBuffer(): java.util.BitSet =
    new java.util.BitSet()

  override def update(
      buf: java.util.BitSet, input: InternalRow): java.util.BitSet = {
    val v = child.eval(input)
    if (v != null) {
      val k = v match {
        case i: Int => i.toLong
        case l: Long => l
      }
      if (k < 0 || k >= maxBits) throw new IllegalArgumentException(
        s"bitmap_distinct key $k outside dense domain [0, $maxBits); " +
          "raise maxBits or remap keys (roaring containers are the " +
          "sparse-domain extension)")
      buf.set(k.toInt)
    }
    buf
  }

  override def merge(
      b1: java.util.BitSet, b2: java.util.BitSet): java.util.BitSet = {
    b1.or(b2)
    b1
  }

  override def eval(buf: java.util.BitSet): Any = buf.cardinality().toLong

  override def serialize(buf: java.util.BitSet): Array[Byte] =
    buf.toByteArray

  override def deserialize(b: Array[Byte]): java.util.BitSet =
    java.util.BitSet.valueOf(b)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapDistinct =
    copy(child = newChild)
}

object BitmapFunctions {
  /** Column API: exact mergeable distinct count of an integer key
    * column with dense domain [0, maxBits).
    */
  def bitmapDistinct(c: Column, maxBits: Int): Column =
    ColumnBridge.column(
      BitmapDistinct(ColumnBridge.expression(c), maxBits).toAggregateExpression())
}
