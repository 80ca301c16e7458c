package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd integer-vector kernels for the similarity path.
  * The built-in composition (`aggregate(zip_with(...))`) allocates an
  * intermediate array and evaluates the lambdas interpreted per
  * element; these compile to a tight primitive loop inside whole-stage
  * codegen. Inputs are the quantized `array<long>` vectors
  * (graft.queries.Similarity), so arithmetic is exact and
  * order-independent.
  */
abstract class LongVectorKernel extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  /** Java statement(s): given array vars `$a`,`$b`, length `$n`,
    * index `$i`, accumulate into long `$s`. */
  protected def loopBody(a: String, b: String, i: String, s: String): String
  protected def accumulate(a: ArrayData, b: ArrayData, i: Int): Long

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
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
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $s = 0L;
        for (int $i = 0; $i < $n; $i++) {
          ${loopBody(a, b, i, s)}
        }
        ${ev.value} = $s;
      """
    })
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

object VectorFunctions {
  def dotLong(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def l2sqLong(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongArrayL2Sq(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
