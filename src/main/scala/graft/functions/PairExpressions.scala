package graft.functions

import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
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
  /** Expansion guard: a single hot key allocating millions of
    * GenericInternalRows inside one expression eval is an executor
    * OOM, not just slow — so the default cap is 2M pairs (~a few
    * hundred MB worst case), far below the Int-overflow bound
    * (n ~ 46k overflows n*(n-1)/2). A bucket past the cap is a
    * stopword-class key the caller must cap or filter — fail with
    * that advice instead of a NegativeArraySizeException (or OOM)
    * deep in codegen. Callers with more headroom can raise it per
    * expression ([[OrderedPairs]] maxPairs).
    */
  val DefaultMaxPairs = 2_000_000L

  def orderedPairs(arr: ArrayData, maxPairs: Long): ArrayData = {
    val n = arr.numElements()
    val nPairs = n.toLong * (n - 1) / 2
    if (nPairs > maxPairs)
      throw new IllegalArgumentException(
        s"ordered_pairs: posting list of $n elements expands to $nPairs " +
          s"pairs (> $maxPairs); cap or filter hot keys before expansion")
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          "ordered_pairs: null element in posting list")
      i += 1
    }
    val ds = arr.toLongArray()
    Arrays.sort(ds)
    val out = new Array[AnyRef](nPairs.toInt)
    var k = 0
    i = 0
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

case class OrderedPairs(
    child: Expression,
    maxPairs: Long = PairKernel.DefaultMaxPairs)
    extends UnaryExpression with ExpectsInputTypes {
  // the upper bound keeps nPairs.toInt from wrapping negative — a cap
  // past Int.MaxValue would reintroduce the NegativeArraySizeException
  // this guard exists to replace
  require(
    maxPairs > 0 && maxPairs <= Int.MaxValue.toLong,
    s"maxPairs must be in (0, ${Int.MaxValue}]")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  // analysis-time typing (SQL-exposed as ordered_pairs): an
  // array<int> or array<string> argument fails the plan, not the
  // executor; null ELEMENTS are still a runtime error with a clear
  // message (the expected type is nullability-insensitive)
  override def inputTypes = Seq(ArrayType(LongType))

  override def nullSafeEval(input: Any): Any =
    PairKernel.orderedPairs(input.asInstanceOf[ArrayData], maxPairs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PairKernel.orderedPairs($c, ${maxPairs}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PairFunctions {
  def orderedPairs(
      postings: Column,
      maxPairs: Long = PairKernel.DefaultMaxPairs): Column =
    ColumnBridge.column(
      OrderedPairs(ColumnBridge.expression(postings), maxPairs))
}
