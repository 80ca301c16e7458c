package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass kernels for the md5-based text-dedup family. The
  * built-in compositions evaluate interpreted lambdas per array
  * element (32 `aggregate` passes for simhash, 8 `transform` passes
  * for minhash); these fold everything into one tight loop sharing a
  * single MessageDigest per row, called from whole-stage codegen.
  * Hash math is bit-identical to the DuckDB oracles, which state it
  * as md5-hex expressions (see graft.queries.Dedup oracle SQL).
  */
object TextHashKernel {

  /** 32-char '1'/'0' simhash over md5 hex-char parities: for token t,
    * hex digit j of md5(t) contributes +1 when its ASCII code is odd,
    * -1 when even (nibble v < 10 renders '0'+v => parity v&1; v >= 10
    * renders 'a'+v-10 => parity (v&1)^1). Sum over token OCCURRENCES
    * equals the oracle's count-weighted sum over distinct tokens.
    */
  def simhash32(toks: ArrayData): UTF8String = {
    val md = MessageDigest.getInstance("MD5")
    val sums = new Array[Int](32)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        md.reset()
        val d = md.digest(toks.getUTF8String(i).getBytes)
        var k = 0
        while (k < 16) {
          val b = d(k) & 0xff
          val hi = b >>> 4
          val lo = b & 0xf
          sums(2 * k) += (if (hi < 10) (hi & 1) else ((hi & 1) ^ 1)) * 2 - 1
          sums(2 * k + 1) += (if (lo < 10) (lo & 1) else ((lo & 1) ^ 1)) * 2 - 1
          k += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](32)
    var j = 0
    while (j < 32) { out(j) = if (sums(j) > 0) '1' else '0'; j += 1 }
    UTF8String.fromBytes(out)
  }

  private val HexChars = "0123456789abcdef".getBytes

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexChars((d(i) & 0xff) >>> 4)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned byte-wise compare == lexicographic compare of the hex
    * rendering (each byte maps monotonically to its two hex chars).
    */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** `numHashes` minwise signatures over a shingle array: element h of
    * the result is min over shingles s of md5hex("h|" + s) — the same
    * value as the builtin `min(md5(concat(h, '|', shingle)))`.
    * Returns null signature elements for an empty array (min over
    * nothing), matching the aggregate-form semantics.
    */
  def minhashSig(shingles: ArrayData, numHashes: Int): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[Array[Byte]](numHashes)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i).getBytes
        var h = 0
        while (h < numHashes) {
          md.reset()
          md.update(('0' + h).toByte) // single digit: numHashes <= 10
          md.update('|'.toByte)
          md.update(s)
          val d = md.digest()
          if (mins(h) == null || less(d, mins(h))) mins(h) = d
          h += 1
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](numHashes)
    var h = 0
    while (h < numHashes) {
      out(h) = if (mins(h) == null) null else hex(mins(h))
      h += 1
    }
    new GenericArrayData(out)
  }
}

/** simhash32 over a token array (see [[TextHashKernel.simhash32]]). */
case class SimHash32(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  // SQL-exposed: wrong argument types are analysis errors, not
  // executor ClassCastExceptions (null elements are skipped in eval)
  override def inputTypes = Seq(ArrayType(StringType))

  override def nullSafeEval(input: Any): Any =
    TextHashKernel.simhash32(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashKernel.simhash32($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Minwise signature array (see [[TextHashKernel.minhashSig]]). */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numHashes > 0 && numHashes <= 10, "single-digit hash seeds only")
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def inputTypes = Seq(ArrayType(StringType))

  override def nullSafeEval(input: Any): Any =
    TextHashKernel.minhashSig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashKernel.minhashSig($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextHashFunctions {
  def simhash32(toks: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(toks)))
  def minhashSig(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), numHashes))
}
