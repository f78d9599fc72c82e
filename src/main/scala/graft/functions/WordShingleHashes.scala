package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object ShingleKernels {

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L
  private final val Mix = 0x9E3779B97F4A7C15L

  /** Distinct 64-bit hashes of the word k-shingles of `s`.
    *
    * Tokenization matches Spark's `split(text, " ")` exactly (limit -1:
    * trailing empty tokens kept), so shingle COUNT semantics equal the
    * string-based `Texty.wordShingles` + hash pipeline — only the hash
    * function differs (FNV-per-token + polynomial combine instead of
    * xxhash64 of the joined string), which is invisible to any consumer
    * that treats the hash as opaque identity (Jaccard counts, MinHash).
    * Docs with fewer than k tokens yield an empty array. */
  def wordShingleHashes(s: UTF8String, k: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val n = toks.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    // hash each token once
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      var h = FnvOffset
      val t = toks(i)
      var j = 0
      while (j < t.length) { h ^= t.charAt(j); h *= FnvPrime; j += 1 }
      th(i) = h
      i += 1
    }
    // polynomial combine per shingle, then sort+dedup in place — fully
    // primitive (a HashSet would box every hash; GenericArrayData boxes
    // on construction). Consumers explode the array as a SET, so the
    // sorted order is as good as first-seen order.
    val out = new Array[Long](n)
    i = 0
    while (i < n) {
      var h = 0L
      var j = 0
      while (j < k) { h = h * Mix + th(i + j); j += 1 }
      out(i) = h
      i += 1
    }
    java.util.Arrays.sort(out)
    var m = 0
    i = 0
    while (i < n) {
      if (m == 0 || out(i) != out(m - 1)) { out(m) = out(i); m += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(out, m))
  }

  /** Distinct word k-shingles of `s` as STRINGS (first-seen order) —
    * the string twin of [[wordShingleHashes]] for consumers that need
    * the shingle text itself (bigram tables), with identical
    * tokenization and the same single-space joining as
    * `concat_ws(" ", …)`. One pass + hash-set dedup instead of the
    * interpreted transform/concat_ws/array_distinct chain (whose
    * distinct alone is O(n²) string comparisons per doc). */
  def wordShingleStrings(s: UTF8String, k: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val n = toks.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[AnyRef])
    val seen = new java.util.LinkedHashSet[String](n * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = UTF8String.fromString(it.next()); m += 1 }
    new GenericArrayData(out)
  }
}

/** Codegen'd distinct word-k-shingle hashes of a string column.
  *
  * Why custom: the composable form — explode(array_distinct(transform(
  * sequence(...), i => concat_ws(...)))) then hash — is interpreted
  * (higher-order functions don't codegen), allocates every shingle
  * string, and runs array_distinct's O(n²) string comparisons per doc.
  * This kernel hashes tokens once and combines in long arithmetic: no
  * shingle strings ever exist. ~10x per-doc on the documents corpus.
  */
case class WordShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"k must be >= 1, got $k")
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hashes expects a string input, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleKernels.wordShingleHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleKernels$$.MODULE$$.wordShingleHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "word_shingle_hashes"
}

object WordShingleHashes {
  def apply(c: Column, k: Int): Column =
    Bridge.column(WordShingleHashes(Bridge.expression(c), k))
}

/** Codegen'd distinct word-k-shingle STRINGS — see
  * [[ShingleKernels.wordShingleStrings]]. Same result set as
  * `Texty.wordShingles` (which stays as the interpreted cross-check
  * twin in TextDedupSpec). */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"k must be >= 1, got $k")
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects a string input, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleKernels.wordShingleStrings(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleKernels$$.MODULE$$.wordShingleStrings($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {
  def apply(c: Column, k: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(c), k))
}
