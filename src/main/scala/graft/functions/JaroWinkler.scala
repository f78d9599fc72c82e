package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro / Jaro-Winkler similarity kernels, bit-compatible with DuckDB's
  * `jaro_winkler_similarity` (which follows the RapidFuzz formulation) so
  * the fuzzy-match operator can carry a real cross-engine oracle — the
  * same two-independent-implementations discipline as the NFC normalizer
  * (`functions/NfcNormalize.scala`).
  *
  * Semantics pinned by probing DuckDB directly (not from any reference
  * code): match window `max(0, max(|a|,|b|)/2 - 1)` (so `jaro("a","ba") =
  * 0` and `jaro("a","a") = 1`), transposition count = mismatched matched
  * positions halved with INTEGER division (probe: `jaro('abcdef','bcadef')
  * = 0.9444…` = t=1, not the textbook t=1.5 → 0.9167), either side empty
  * → 0.0, Winkler prefix bonus (≤4 chars, weight 0.1) only when jaro is
  * STRICTLY above 0.7 (probe: `jw('abcdxxxxxx','abcdyyyyyy') = 0.6`).
  * Double arithmetic mirrors the C++ association order
  * `(m/l1 + m/l2 + (m-t)/m)/3` and `sim + (p*0.1)*(1-sim)` so both
  * engines produce the same IEEE-754 double, making even the rounded
  * basis-point score hash-comparable.
  *
  * ASCII caveat (shared with `Portable`): DuckDB operates on BYTES
  * (probe: `jaro('héllo','hello')` scores the é as two mismatched
  * bytes), this kernel on UTF-16 code units — identical on the ASCII
  * driver corpus; only the DuckDB twin is ASCII-bound.
  */
object FuzzyKernels {

  /** DuckDB/RapidFuzz-compatible Jaro similarity. O(|a|·window) with two
    * small boolean scratch arrays — per-row cost is bounded by the string
    * lengths, no allocation beyond the two flag arrays. */
  def jaro(s1: String, s2: String): Double = {
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var matched = false
      while (j <= hi && !matched) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0; var tcount = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) tcount += 1
        k += 1
      }
      i += 1
    }
    val t = tcount / 2 // integer halving — see scaladoc probe
    (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
  }

  /** Winkler prefix boost on top of [[jaro]]: only when jaro > 0.7,
    * common prefix capped at 4, weight 0.1. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString; val s2 = b.toString
    val sim = jaro(s1, s2)
    if (sim <= 0.7) return sim
    val cap = math.min(4, math.min(s1.length, s2.length))
    var p = 0
    while (p < cap && s1.charAt(p) == s2.charAt(p)) p += 1
    sim + p.toDouble * 0.1 * (1.0 - sim)
  }
}

/** Codegen'd Jaro-Winkler similarity of two string columns. Why custom:
  * Spark ships `levenshtein` but no Jaro-Winkler, and the entity-
  * resolution operator needs a scorer that (a) runs inside
  * WholeStageCodegen on the blocked candidate pairs and (b) has an
  * independent DuckDB twin for the oracle. A Scala UDF would satisfy
  * neither (interpreted boundary, Encoder churn). */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got $t")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    FuzzyKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.FuzzyKernels$$.MODULE$$.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

object JaroWinkler {
  def apply(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))
}
