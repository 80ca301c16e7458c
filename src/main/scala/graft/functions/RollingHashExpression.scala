package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial (Rabin-Karp) rolling hash over a string's bytes:
  * `acc = (acc * 31 + byte) mod 1e9+7`. Codegen'd tight loop; the
  * DuckDB oracle states the identical fold with
  * `list_reduce(... (x*31+y) % 1000000007)` over `ord()` values
  * (equal byte-wise for ASCII content).
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  // SQL-exposed (rolling_hash): non-string arguments fail at analysis
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var acc = 0L
    var i = 0
    while (i < n) { acc = (acc * 31 + (s.getByte(i) & 0xff)) % 1000000007L; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = $c.numBytes();
        long $acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $acc = ($acc * 31 + ($c.getByte($i) & 0xff)) % 1000000007L;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHashFunction {
  def rollingHash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
}
