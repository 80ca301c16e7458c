package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** Native codegen'd integer-vector kernels for the similarity path.
  * The built-in composition (`aggregate(zip_with(...))`) allocates an
  * intermediate array and evaluates the lambdas interpreted per
  * element; these compile to a tight primitive loop inside whole-stage
  * codegen. Inputs are the quantized `array<long>` vectors
  * (graft.queries.Similarity), so arithmetic is exact and
  * order-independent.
  */
abstract class LongVectorKernel extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  // analysis-time typing (these kernels are SQL-exposed as vec_dot /
  // vec_l2sq): wrong argument types fail the query plan, not the
  // executor; `sameType` is nullability-insensitive, so arrays with
  // nullable elements still pass (null elements read as 0 via
  // ArrayData.getLong — same as before). No explicit result type:
  // AbstractDataType is private[sql], the inferred Seq[ArrayType]
  // conforms.
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))

  /** Java statement(s): given array vars `$a`,`$b`, length `$n`,
    * index `$i`, accumulate into long `$s`. */
  protected def loopBody(a: String, b: String, i: String, s: String): String
  protected def accumulate(a: ArrayData, b: ArrayData, i: Int): Long

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = LongVectorKernel.checkedLength(a, b)
    var s = 0L
    var i = 0
    while (i < n) { s += accumulate(a, b, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
        int $n = graft.functions.LongVectorKernel.checkedLength($a, $b);
        long $s = 0L;
        for (int $i = 0; $i < $n; $i++) {
          ${loopBody(a, b, i, s)}
        }
        ${ev.value} = $s;
      """
    })
}

object LongVectorKernel {
  /** Dimension mismatch is an upstream bug (ragged table, bad slice);
    * silently truncating to min(length) would turn it into quietly
    * wrong similarity scores — fail with the shapes instead.
    */
  def checkedLength(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"vector kernel dimension mismatch: $n vs ${b.numElements()}")
    n
  }
}

/** Exact dot product of two long arrays. */
case class LongArrayDot(left: Expression, right: Expression)
    extends LongVectorKernel {
  override protected def loopBody(a: String, b: String, i: String, s: String) =
    s"$s += $a.getLong($i) * $b.getLong($i);"
  override protected def accumulate(a: ArrayData, b: ArrayData, i: Int): Long =
    a.getLong(i) * b.getLong(i)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact squared L2 distance of two long arrays. */
case class LongArrayL2Sq(left: Expression, right: Expression)
    extends LongVectorKernel {
  override protected def loopBody(a: String, b: String, i: String, s: String) =
    s"long d$i = $a.getLong($i) - $b.getLong($i); $s += d$i * d$i;"
  override protected def accumulate(a: ArrayData, b: ArrayData, i: Int): Long = {
    val d = a.getLong(i) - b.getLong(i)
    d * d
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Per-row argmin against a broadcast centroid table: one tight loop
  * over `array<struct<c_id: long, cv: array<long>>>`, returning the
  * c_id with the smallest exact L2^2 distance (ties -> smaller c_id,
  * so the result is independent of centroid array order). This is the
  * IVF assignment step as narrow per-row work: the crossJoin(N x K
  * rows) + row_number window it replaces shuffled the expanded table
  * just to take this argmin. Null/empty centroid set => null (no
  * assignment), mirroring the argmin-over-nothing semantics.
  */
object CentroidKernel {
  def nearest(v: ArrayData, cents: ArrayData): java.lang.Long =
    nearestExcluding(v, cents, Long.MinValue)

  /** Argmin skipping `exclude` — rank-2 retrieval for multi-probe
    * search composes as nearest + nearestExcluding(nearest), with the
    * same (d2, c_id) tie-break as `ROW_NUMBER() OVER (ORDER BY d2,
    * c_id)`. Pass Long.MinValue (never a real id) for plain argmin.
    */
  def nearestExcluding(
      v: ArrayData, cents: ArrayData, exclude: Long): java.lang.Long = {
    val k = cents.numElements()
    var bestD = Long.MaxValue
    var bestId = Long.MaxValue
    var found = false
    var i = 0
    while (i < k) {
      if (!cents.isNullAt(i)) {
        val c = cents.getStruct(i, 2)
        // a null c_id or null vector field passes the analysis-time
        // struct check (nullable fields) — skip such a centroid
        // rather than NPE (null cv) or silently reading id 0 and
        // corrupting the (d2, c_id) tie-break (null c_id)
        if (!c.isNullAt(0) && !c.isNullAt(1)) {
          val cid = c.getLong(0)
          if (cid != exclude) {
            val cv = c.getArray(1)
            val n = LongVectorKernel.checkedLength(v, cv)
            var d = 0L
            var j = 0
            while (j < n) {
              val t = v.getLong(j) - cv.getLong(j)
              d += t * t
              j += 1
            }
            if (!found || d < bestD || (d == bestD && cid < bestId)) {
              bestD = d; bestId = cid; found = true
            }
          }
        }
      }
      i += 1
    }
    if (found) bestId else null
  }
}

/** Second-probe argmin: nearest centroid whose id differs from the
  * third argument (typically the first probe's result).
  */
case class NearestCentroidExcluding(
    first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    NearestCentroid(first, second).checkInputDataTypes() match {
      case TypeCheckResult.TypeCheckSuccess if third.dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case TypeCheckResult.TypeCheckSuccess =>
        TypeCheckResult.TypeCheckFailure(
          s"exclude id must be bigint, got ${third.dataType}")
      case fail => fail
    }

  override def nullSafeEval(v: Any, c: Any, e: Any): Any =
    CentroidKernel.nearestExcluding(
      v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
      e.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c, e) => {
      val tmp = ctx.freshName("cid")
      s"""
        java.lang.Long $tmp = graft.functions.CentroidKernel.nearestExcluding($v, $c, $e);
        if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // empty centroid set => null

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(s: StructType, _))
        if s.length == 2 && s(0).dataType == LongType &&
          s(1).dataType.isInstanceOf[ArrayType] &&
          s(1).dataType.asInstanceOf[ArrayType].elementType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid expects (array<long>, array<struct<long, array<long>>>), got ($l, $r)")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    CentroidKernel.nearest(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val tmp = ctx.freshName("cid")
      s"""
        java.lang.Long $tmp = graft.functions.CentroidKernel.nearest($v, $c);
        if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Element-wise sum of `array<long>` vectors as a typed imperative
  * AGGREGATE — the building block for distributed centroid updates
  * (k-means M-step): partial buffers sum map-side, merge is
  * element-wise add, so a 100 TB E-step/M-step round is one
  * map-side-combinable shuffle of K x dim longs. Quantized integer
  * arithmetic keeps the result exact and order-independent (no float
  * reduction nondeterminism across partitionings). The buffer sizes
  * itself lazily to the first vector's length.
  */
case class LongVectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[Array[Long]]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  // SQL-exposed as vec_sum: without this gate an array<int> argument
  // resolves and then getLong misreads the packed element region into
  // silently wrong sums (its siblings vec_dot/vec_l2sq already gate)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sum expects array<bigint>, got $other")
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val b = if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)
      var i = 0
      while (i < n) { b(i) += arr.getLong(i); i += 1 }
      b
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    // always merge INTO (a copy of) b1 — the framework may reuse the
    // input buffer
    val b =
      if (b1.length >= b2.length) b1 else java.util.Arrays.copyOf(b1, b2.length)
    var i = 0
    while (i < b2.length) { b(i) += b2(i); i += 1 }
    b
  }

  override def eval(buf: Array[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongVectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongVectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): LongVectorSum =
    copy(child = newChild)
}

object VectorFunctions {
  def dotLong(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def l2sqLong(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongArrayL2Sq(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def nearestCentroid(v: Column, cents: Column): Column =
    ColumnBridge.column(
      NearestCentroid(ColumnBridge.expression(v), ColumnBridge.expression(cents)))
  def nearestCentroidExcluding(v: Column, cents: Column, exclude: Column): Column =
    ColumnBridge.column(
      NearestCentroidExcluding(
        ColumnBridge.expression(v), ColumnBridge.expression(cents),
        ColumnBridge.expression(exclude)))
  def vecSum(v: Column): Column =
    ColumnBridge.column(
      LongVectorSum(ColumnBridge.expression(v)).toAggregateExpression())
}
