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
  /** Unicode normalization via the JDK's Normalizer — the cleaning pass
    * that makes composed ("é" U+00E9) and decomposed ("e" + U+0301)
    * spellings of the same text fingerprint-identical (NFC/NFD), and
    * additionally folds compatibility variants — ligatures "ﬁ"→"fi",
    * fullwidth "Ａ"→"A" — for search/tokenization (NFKC/NFKD). Each
    * form is fully specified by Unicode, so any conforming
    * implementation (here the JDK; utf8proc in the DuckDB oracle)
    * yields identical bytes — which is what makes the NFC dedup surface
    * oracle-checkable. Fast path: Normalizer.isNormalized is a cheap
    * scan and almost all real text is already normalized — skip the
    * rebuild when it is. */
  def normalize(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }

  def nfc(s: UTF8String): UTF8String =
    normalize(s, java.text.Normalizer.Form.NFC)
}

/** Codegen'd Unicode normalization of a string column to `form`
  * (NFC / NFD / NFKC / NFKD — a compile-time constant of the generated
  * code, like the shingle kernels' k).
  *
  * Why custom: Spark has no normalization function at all, and a Scala
  * UDF would box every row out of Tungsten; this is one JDK call inside
  * WholeStageCodegen with an already-normalized fast path. */
case class UnicodeNormalize(child: Expression,
    form: java.text.Normalizer.Form) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got $t")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcKernel.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "graft.functions.NfcKernel$.MODULE$.normalize(" + c +
        ", java.text.Normalizer.Form." + form.name + ")")

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize =
    copy(child = newChild)

  override def prettyName: String =
    form.name.toLowerCase(java.util.Locale.ROOT) + "_normalize"
}

object UnicodeNormalize {
  def apply(c: Column, form: java.text.Normalizer.Form): Column =
    Bridge.column(UnicodeNormalize(Bridge.expression(c), form))
}

/** The NFC member of [[UnicodeNormalize]] — kept as a named constructor
  * because it is the dedup-surface default and the SQL `nfc_normalize`. */
object NfcNormalize {
  def apply(c: Column): Column =
    UnicodeNormalize(c, java.text.Normalizer.Form.NFC)

  def apply(e: Expression): UnicodeNormalize =
    UnicodeNormalize(e, java.text.Normalizer.Form.NFC)
}
