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

/** KMV (k-minimum-values) distinct sketch as a real mergeable
  * aggregate: the buffer is the set of the k SMALLEST distinct hash
  * values seen. Unlike Misra–Gries, the result is fully DETERMINISTIC
  * under any merge tree — "k smallest distinct elements of a multiset"
  * is merge-order invariant — so the estimate itself is reproducible
  * across partitionings, AQE re-plans and cluster sizes (the property
  * `kmv_distinct` pins relationally; this is the one-pass aggregate
  * form: k-sized buffers, map-side combinable, no WindowGroupLimit
  * shuffle of distinct pairs).
  *
  * Input is a 60-bit content hash (e.g. 15 md5 hex chars); output is
  * `struct(n_min, theta, est)` with est = n_min when the set never
  * filled, else floor((k−1)·2⁶⁰/θ) — the same closed form, same
  * double arithmetic, as the relational query.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with UnaryLike[Expression] {

  require(k >= 2 && k <= 65536, s"kmv_sketch k must be in [2, 65536], got $k")

  private val HashSpace = 1152921504606846976L // 2^60

  override def dataType: DataType = StructType(Seq(
    StructField("n_min", LongType, nullable = false),
    StructField("theta", LongType, nullable = true),
    StructField("est", LongType, nullable = false)))

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch expects a long hash column, got $other")
  }

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty

  private def insert(buf: mutable.TreeSet[Long], h: Long): Unit =
    if (buf.size < k) buf += h
    else if (h < buf.last && !buf.contains(h)) { buf -= buf.last; buf += h }

  override def update(
      buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      b1: mutable.TreeSet[Long], b2: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b2.foreach(insert(b1, _))
    b1
  }

  override def eval(buf: mutable.TreeSet[Long]): Any = {
    val n = buf.size.toLong
    if (n < k) InternalRow(n, if (buf.isEmpty) null else buf.last, n)
    else {
      val theta = buf.last
      val est = math.floor(
        (k - 1).toDouble * HashSpace.toDouble / theta.toDouble).toLong
      InternalRow(n, theta, est)
    }
  }

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(b: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val n = bb.getInt()
    val out = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { out += bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object SketchFunctions {
  /** Column API: `misraGries(col, k)` aggregate. */
  def misraGries(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Column API: `kmvSketch(hashCol, k)` aggregate. */
  def kmvSketch(c: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketch(ColumnBridge.expression(c), k).toAggregateExpression())
}
