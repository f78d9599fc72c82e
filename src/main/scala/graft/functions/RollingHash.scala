package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object TextKernels {
  final val RollMod = 1000000007L

  /** Polynomial rolling hash over Unicode code points:
    * acc = (acc*31 + cp) mod 1e9+7. Equals the composable
    * `aggregate(split(text,""), 0L, (a,c) => pmod(a*31+ascii(c), p))`
    * form for any BMP text (split-on-"" yields one char per code point
    * there) and is additionally correct for supplementary planes. */
  def rollingHash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = java.lang.Math.floorMod(acc * 31L + cp, RollMod)
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Codegen'd rolling-hash fingerprint of a string column.
  *
  * Why custom: the higher-order `aggregate(split(text,''),…)` form is
  * interpreted AND allocates a UTF8String per character per row — it
  * dominated the doc_fingerprint benchmark. This is one tight loop over
  * the string inside WholeStageCodegen, no per-char allocation.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects a string input, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextKernels.rollingHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => "graft.functions.TextKernels$.MODULE$.rollingHash(" + c + ")")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  def apply(c: Column): Column =
    Bridge.column(RollingHash(Bridge.expression(c)))
}
