package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions registering the graft native expressions for SQL:
  *
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  *   SELECT simhash64(norm, 5), fnv1a64(s) FROM ...
  *
  * For a session that is ALREADY built (notebooks, shared test sessions —
  * the extensions conf only applies at session construction), use
  * [[GraftExtensions.register]] instead.
  *
  * (The Scala DSL path goes through graft.ops.Exprs and does not need the
  * extension.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(e.injectFunction)
    e.injectOptimizerRule(_ => NormalizeLowerElision)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[SimHash64Expr].getName, null, name, usage, "")

  private[functions] val functions: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(str, k) - 64-bit SimHash over byte k-grams (FNV-1a)"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "simhash64(str, k) takes 2 arguments")
        val k = exprs(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"simhash64 k must be an integer literal, got $other")
        }
        SimHash64Expr(exprs.head, k)
      }),
    (FunctionIdentifier("fnv1a64"),
      info("fnv1a64", "fnv1a64(str) - FNV-1a 64-bit hash of the UTF-8 bytes"),
      (exprs: Seq[Expression]) => Fnv1a64Expr(exprs.head)),
    (FunctionIdentifier("graft_normalize"),
      info("graft_normalize",
        "graft_normalize(str) - reference N1 normalize (lower, collapse runs, letter/digit filter, trim) in one fused pass"),
      (exprs: Seq[Expression]) => NormalizeExpr(exprs.head)),
    (FunctionIdentifier("rolling_hash"),
      info("rolling_hash",
        "rolling_hash(str) - h = (h*31 + codepoint) % 1000000007 over the string's codepoints (document fingerprint)"),
      (exprs: Seq[Expression]) => RollingHashExpr(exprs.head)),
    (FunctionIdentifier("float_dot"),
      info("float_dot",
        "float_dot(arr, arr) - dot product of two float arrays (the fused ANN re-rank kernel)"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "float_dot(a, b) takes 2 arguments")
        FloatDotExpr(exprs(0), exprs(1))
      }),
    (FunctionIdentifier("long_dot"),
      info("long_dot",
        "long_dot(arr, arr) - exact int64 dot product of two bigint arrays (the SemDeDup pair kernel)"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "long_dot(a, b) takes 2 arguments")
        LongDotExpr(exprs(0), exprs(1))
      }))

  /** Register the graft SQL functions on an existing session (idempotent —
    * re-registration replaces the same builders).
    */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, fi, b) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, id, fi, b)
    }

  /** Add the graft optimizer rules to an ALREADY-built session (idempotent).
    * Sessions built with `spark.sql.extensions=graft.functions.
    * GraftExtensions` get them injected into the operator-optimization
    * batch instead and do not need this.
    */
  def registerRules(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(NormalizeLowerElision))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ NormalizeLowerElision
}
