package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object NfcKernel {
  /** Unicode NFC (canonical composition) via the JDK's Normalizer — the
    * cleaning pass that makes composed ("é" U+00E9) and decomposed
    * ("e" + U+0301) spellings of the same text fingerprint-identical.
    * NFC is fully specified by Unicode, so any conforming implementation
    * (here the JDK; utf8proc in the DuckDB oracle) yields identical
    * bytes — which is what makes the dedup surface oracle-checkable.
    * Fast path: Normalizer.isNormalized is a cheap scan and almost all
    * real text is already NFC — skip the rebuild when it is. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Codegen'd Unicode NFC normalization of a string column.
  *
  * Why custom: Spark has no normalization function at all, and a Scala
  * UDF would box every row out of Tungsten; this is one JDK call inside
  * WholeStageCodegen with an already-normalized fast path. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string input, got $t")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => "graft.functions.NfcKernel$.MODULE$.nfc(" + c + ")")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  def apply(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))
}
