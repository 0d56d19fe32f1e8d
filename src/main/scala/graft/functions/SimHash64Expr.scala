package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import graft.kernel.Hashing

/** Static eval target for codegen — keeps the generated Java a single
  * static call and works straight off UTF8String's UTF-8 bytes (the
  * reference hashes Go string BYTES, internal/dedupe/dedupe.go:120-131,
  * so no String round-trip is needed or wanted).
  */
object SimHash64Eval {
  def eval(s: UTF8String, k: Int): Long = Hashing.simhash64Bytes(s.getBytes, k)
}

/** H3 as a native Catalyst expression (reference: internal/dedupe/
  * dedupe.go:150-185). Compared to the Scala-UDF form this stays inside
  * whole-stage codegen (no InternalRow -> Row conversion, no closure
  * serialization): `doGenCode` emits one static call per row.
  */
case class SimHash64Expr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64Eval.eval(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64Eval.eval($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** FNV-1a 64 as a native expression (H1). */
object Fnv1a64Eval {
  def eval(s: UTF8String): Long = Hashing.fnv1a64(s.getBytes)
}

case class Fnv1a64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv1a64"

  override protected def nullSafeEval(input: Any): Any =
    Fnv1a64Eval.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv1a64Eval.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64Expr =
    copy(child = newChild)
}

/** Static eval target for the code-point polynomial rolling hash
  * h := (h*31 + codePoint) mod 1e9+7, decoding UTF-8 in place — matches the
  * HOF formulation aggregate(transform(split(text, ''), ascii), ...) exactly
  * (Spark's empty-pattern split yields one element per CODE POINT and ascii
  * returns the full code point — verified empirically on 2/3/4-byte
  * sequences), without materializing a single-char string per character
  * (~16 bytes/char) or running an interpreted lambda per element.
  */
object RollingHashEval {
  def eval(s: UTF8String): Long = {
    val b = s.getBytes
    val n = b.length
    var h = 0L
    var i = 0
    while (i < n) {
      val b0 = b(i) & 0xFF
      var cp = 0
      // malformed UTF-8 (possible when binary data is read as string) must
      // DEGRADE, not crash: a lead byte whose continuation bytes run past
      // the buffer, a stray continuation byte, or an invalid 0xF8+ lead is
      // consumed as a single unit — mirroring how the interpreted
      // split+ascii twin degrades — instead of indexing out of bounds
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if ((b0 & 0xE0) == 0xC0 && i + 1 < n) {
        cp = ((b0 & 0x1F) << 6) | (b(i + 1) & 0x3F); i += 2
      } else if ((b0 & 0xF0) == 0xE0 && i + 2 < n) {
        cp = ((b0 & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) | (b(i + 2) & 0x3F); i += 3
      } else if ((b0 & 0xF8) == 0xF0 && i + 3 < n) {
        cp = ((b0 & 0x07) << 18) | ((b(i + 1) & 0x3F) << 12) |
          ((b(i + 2) & 0x3F) << 6) | (b(i + 3) & 0x3F); i += 4
      } else {
        cp = b0; i += 1 // invalid or truncated sequence: one unit, move on
      }
      h = (h * 31L + cp) % 1000000007L
    }
    h
  }
}

/** q31's rolling fingerprint as a native codegen expression — the last
  * interpreted HOF fold on a scan stage (per the round-3 audit); same
  * static-eval doGenCode pattern as [[Fnv1a64Expr]].
  */
case class RollingHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHashEval.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHashEval.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

/** Static eval target for the float-vector dot product. Left-fold in element
  * order with double accumulation — bit-identical to the
  * zip_with+aggregate formulation AND to DuckDB's list fold, so the oracle
  * comparison stays exact.
  */
object FloatDotEval {
  def eval(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }
}

/** Static eval target for the long-vector dot product (the SemDeDup pair
  * kernel): exact int64 arithmetic, identical to the
  * aggregate(zip_with(a, b, _*_), 0, _+_) fold it replaces — integer adds
  * are associative, so there is no order sensitivity to preserve.
  */
object LongDotEval {
  def eval(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }
}

/** Dot product over two Array[Long] columns as a codegen expression — the
  * integer twin of [[FloatDotExpr]], for the same reason: the HOF
  * aggregate-over-zip_with fold is interpreted per ELEMENT and dominated
  * the SemDeDup cluster-pair join (q70) where it ran once per candidate
  * pair.
  */
case class LongDotExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LongDotEval.eval(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LongDotEval.eval($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotExpr =
    copy(left = newLeft, right = newRight)
}

/** Dot product over two Array[Float] columns as a codegen expression.
  * The built-in formulation (aggregate over zip_with) is interpreted —
  * higher-order functions have no doGenCode — and costs ~100x more per pair
  * (observed dominating the sf0.1 bench via jstack).
  */
case class FloatDotExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FloatDotEval.eval(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.FloatDotEval.eval($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotExpr =
    copy(left = newLeft, right = newRight)
}
