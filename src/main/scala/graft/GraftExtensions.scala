package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArrayDot, RollingHash}

/** SparkSessionExtensions installer: exposes the engine's custom codegen
  * expressions to SQL (`spark.sql("SELECT array_dot(a, b) ...")`) so the
  * library surface is reachable from pure-SQL callers, not just the
  * Column API. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` —
  * GraftSession does this by default.
  *
  * No custom Rule/SparkStrategy is injected: every operator in this
  * engine plans through stock Catalyst (SURVEY.md §4) — the extension
  * surface is expressions only, deliberately.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def checkArity(name: String, n: Int, children: Seq[Expression]): Unit =
    if (children.length != n)
      throw new IllegalArgumentException(
        s"$name requires exactly $n argument(s), got ${children.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("array_dot"),
      info("array_dot",
        "array_dot(a, b) - dot product of two float arrays in double"),
      (children: Seq[Expression]) => {
        checkArity("array_dot", 2, children)
        ArrayDot(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      info("rolling_hash",
        "rolling_hash(s) - polynomial rolling hash of a string mod 1e9+7"),
      (children: Seq[Expression]) => {
        checkArity("rolling_hash", 1, children)
        RollingHash(children.head)
      }))
  }
}
