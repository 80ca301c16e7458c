package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (with codegen) for the filter
  * language's strict-typed JSON probes — a single Jackson pass per
  * evaluation, staying inside whole-stage codegen, versus the
  * built-in composition (`parse_json` + `schema_of_variant` +
  * `try_variant_get`) which costs several parses per predicate.
  * Semantics are pinned by the same corpus + property suites that
  * cover the variant-based compiler.
  */
abstract class JsonStrictProbe extends UnaryExpression with ExpectsInputTypes {
  def path: Seq[String]
  protected def helperName: String
  @transient protected lazy val pathArray: Array[String] = path.toArray

  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  // SQL-exposed (json_int_strict / json_string_strict): non-string
  // arguments fail at analysis time
  override def inputTypes = Seq(StringType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val pathRef = ctx.addReferenceObj("path", pathArray, "java.lang.String[]")
    val boxed = ctx.freshName("probed")
    val javaType = CodeGenerator.javaType(dataType)
    val boxedType = CodeGenerator.boxedType(dataType)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      $javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
      if (!${c.isNull}) {
        $boxedType $boxed =
          graft.functions.JsonStrict.$helperName(${c.value}, $pathRef);
        if ($boxed != null) {
          ${ev.isNull} = false;
          ${ev.value} = $boxed;
        }
      }""")
  }
}

/** Strict integer probe: JSON integral number at path, else null. */
case class JsonStrictLong(child: Expression, path: Seq[String])
    extends JsonStrictProbe {
  override def dataType: DataType = LongType
  override protected def helperName: String = "getLong"
  override def nullSafeEval(input: Any): Any =
    JsonStrict.getLong(input.asInstanceOf[UTF8String], pathArray)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Strict string probe: JSON string at path, else null. */
case class JsonStrictString(child: Expression, path: Seq[String])
    extends JsonStrictProbe {
  override def dataType: DataType = StringType
  override protected def helperName: String = "getString"
  override def nullSafeEval(input: Any): Any =
    JsonStrict.getString(input.asInstanceOf[UTF8String], pathArray)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsonStrictFunctions {
  def jsonIntStrict(json: Column, path: Seq[String]): Column =
    ColumnBridge.column(
      JsonStrictLong(ColumnBridge.expression(json), path))
  def jsonStringStrict(json: Column, path: Seq[String]): Column =
    ColumnBridge.column(
      JsonStrictString(ColumnBridge.expression(json), path))
}
