package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType, VariantType}
import org.apache.spark.unsafe.types.VariantVal

/** `variant_filters(payload_variant, filters_array)` — conjunctive
  * filter-language evaluation where the filter strings are DATA (one
  * subscription row each), not plan-time literals. Used as the dynamic
  * fan-out's residual predicate: the payload is parsed to VARIANT once
  * per event row before the broadcast subscription join, so each
  * (event, subscription) pair walks the compact binary instead of
  * re-parsing JSON through a Scala UDF (the r2 shape). Runs inside
  * whole-stage codegen; filter-string parsing memoizes per JVM
  * ([[graft.filters.VariantFilterEval]]).
  *
  * Null variant (unparseable payload) => null => the enclosing filter
  * drops the row, same as FilterEval's bad-JSON no-match. The
  * empty-filter-list => unconditional-match rule is the caller's
  * disjunct (it must win even over a null payload,
  * evtstrd/listener.py:62).
  */
case class VariantFilters(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (VariantType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"variant_filters expects (variant, array<string>), got ($l, $r)")
    }

  override def nullSafeEval(v: Any, f: Any): Any =
    graft.filters.VariantFilterEval.matches(
      v.asInstanceOf[VariantVal], f.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, f) =>
      s"${ev.value} = graft.filters.VariantFilterEval.matches($v, $f);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VariantFilterFunctions {
  def variantFilters(variant: Column, filters: Column): Column =
    ColumnBridge.column(
      VariantFilters(
        ColumnBridge.expression(variant), ColumnBridge.expression(filters)))
}
