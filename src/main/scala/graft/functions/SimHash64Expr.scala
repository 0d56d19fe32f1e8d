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
