package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary: a FIXED-SIZE (k counters)
  * mergeable frequency sketch. The mergeable-summaries guarantee
  * (Agarwal et al., PODS'12) holds under ANY merge tree — i.e. any
  * partitioning / AQE re-plan — so on 100 TB this is a k-row answer
  * to "which values occur more than N/(k+1) times" computed with one
  * map-side-combinable pass and a k-sized shuffle per partition,
  * instead of a full groupBy over every distinct value:
  *
  *   - est(x) <= exact(x)                       (never overestimates)
  *   - exact(x) - est(x) <= N/(k+1)             (N = total non-null rows)
  *   - every x with exact(x) > N/(k+1) is IN the summary
  *
  * Estimates depend on the merge order (only the bounds are
  * guaranteed), so queries surface the guaranteed facts — membership
  * and bound booleans — not raw estimates, keeping results
  * deterministic under any partitioning.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1 && k <= 100000, s"misra_gries k must be in [1, 100000], got $k")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects a string column, got $other")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String].toString
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < k => buf.update(item, 1L)
      case None =>
        // classic MG decrement-all: O(k) on a miss with a full table
        buf.mapValuesInPlace { case (_, c) => c - 1 }
        buf.filterInPlace { case (_, c) => c > 0 }
    }
    buf
  }

  override def merge(
      b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (key, c) =>
      b1.update(key, b1.getOrElse(key, 0L) + c)
    }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count from everything; only
      // entries strictly above it survive — at most k by construction
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - 1 - k)
      b1.mapValuesInPlace { case (_, c) => c - d }
      b1.filterInPlace { case (_, c) => c > 0 }
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic order: estimate desc, then item — though consumers
    // should rely only on membership + bounds (see scaladoc)
    val sorted = buf.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val bytes = entries.map { case (s, _) => s.getBytes("UTF-8") }
    val bb = java.nio.ByteBuffer.allocate(
      4 + bytes.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(b: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val n = bb.getInt()
    val out = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val sb = new Array[Byte](len)
      bb.get(sb)
      out.update(new String(sb, "UTF-8"), bb.getLong())
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object SketchFunctions {
  /** Column API: `misraGries(col, k)` aggregate. */
  def misraGries(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(c), k).toAggregateExpression())
}
