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
  def orderedPairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val ds = arr.toLongArray()
    Arrays.sort(ds)
    val out = new Array[AnyRef](n * (n - 1) / 2)
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
