package graft.functions

import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Ordered-pair expansion of a posting list: `[d1..dk]` (any order) →
  * all `(a, b)` with `a < b` from its sorted form. Replaces the
  * `flatten(transform(ds, (a,i) => transform(slice(ds, i+2, ...))))`
  * composition, whose interpreted lambdas allocate a slice copy per
  * element — this is one codegen'd loop, and the sort is folded in
  * (so no upstream `sort_array` either).
  */
object PairKernel {
  /** Guard far below Int overflow (n ~ 46k would overflow n*(n-1)/2):
    * a bucket this hot is a stopword-class key the caller must cap or
    * filter — fail with that advice instead of a
    * NegativeArraySizeException deep in codegen.
    */
  private val MaxPairs = 50_000_000L

  def orderedPairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val nPairs = n.toLong * (n - 1) / 2
    if (nPairs > MaxPairs)
      throw new IllegalArgumentException(
        s"ordered_pairs: posting list of $n elements expands to $nPairs " +
          s"pairs (> $MaxPairs); cap or filter hot keys before expansion")
    val ds = arr.toLongArray()
    Arrays.sort(ds)
    val out = new Array[AnyRef](nPairs.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(
          Array[Any](ds(i), ds(j))): InternalRow
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class OrderedPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PairKernel.orderedPairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PairKernel.orderedPairs($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PairFunctions {
  def orderedPairs(postings: Column): Column =
    ColumnBridge.column(OrderedPairs(ColumnBridge.expression(postings)))
}
