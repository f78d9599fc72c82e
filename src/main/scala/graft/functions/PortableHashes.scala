package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Portable (engine-independent) hash basis for the dedup operators that
  * need a cross-engine oracle: two-prime polynomial rolling hashes over
  * characters, exactly reproducible in ANSI-ish SQL (DuckDB: `list_reduce`
  * over `string_split_regex(s, '')`, integer arithmetic only — the same
  * construction already oracle-proven by `doc_fingerprint`'s `fp_roll`).
  *
  * Identity strength: the combined value `h1 * P2 + h2` spans ~2⁶⁰
  * states (collision odds ~n²/2⁶⁰ — same regime as the xxhash64-based
  * kernels), so MinHash/SimHash consumers lose nothing by switching
  * basis, and every downstream number (signatures, band keys, bit votes)
  * becomes SQL-checkable end to end. Per-character cost is two multiplies
  * + two Barrett-free `%` — still a codegen'd, allocation-free kernel.
  *
  * The oracle side assumes `ascii(c)` == UTF-16 code unit, i.e. ASCII
  * corpora (the driver corpus is ASCII — see mm_decode_stub). Non-ASCII
  * text still hashes fine in Spark; only the DuckDB twin is ASCII-bound.
  */
object Portable {
  final val P1 = 1000000007L
  final val P2 = 998244353L
  final val B1 = 31L
  final val B2 = 131L
  /** Band-key fold multiplier (bk < P1, so bk*BandMix < 1.4e18 — no
    * 64-bit overflow anywhere in the fold). */
  final val BandMix = 1315423911L

  /** Coefficient multipliers, named so generated oracle SQL can inline
    * the SAME formulas (e.g. `((2*i+1) * AMul) % P1` with `i` as data). */
  final val AMul = 1103515245L
  final val BMul = 790937117L

  /** Seeded affine re-hash coefficients for MinHash components / SimHash
    * bit votes / sign-LSH hyperplanes: a_i*x+b_i mod P1. Both factors
    * < P1, inputs < P1 → products < ~1.1e18, safely inside signed-64. */
  def aCoef(i: Int): Long = ((2L * i + 1L) * AMul) % P1
  def bCoef(i: Int): Long = ((i + 1L) * BMul) % P1

  /** (h1 mod P1, h2 mod P2) rolling hashes of `s[from..until)`. */
  private[functions] def polyPair(s: String, from: Int, until: Int): (Long, Long) = {
    var h1 = 0L; var h2 = 0L
    var i = from
    while (i < until) {
      val c = s.charAt(i).toLong
      h1 = (h1 * B1 + c) % P1
      h2 = (h2 * B2 + c) % P2
      i += 1
    }
    (h1, h2)
  }
}

object PortableKernels {
  import Portable._

  /** Distinct portable hashes of the word k-shingles of `s`: for each
    * shingle the hash is `poly31(str) % P1 * P2 + poly131(str) % P2` where
    * `str` is the shingle's tokens joined with a single space — byte-for-
    * byte the string DuckDB builds with `arr[i] || ' ' || arr[i+1] ...`.
    * Tokenization matches Spark's `split(text, " ")` (limit -1). Docs with
    * fewer than k tokens yield an empty array. Sorted + deduped like
    * [[ShingleKernels.wordShingleHashes]] (consumers treat it as a set).
    */
  def wordShinglePolyHashes(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString
    val toks = str.split(" ", -1)
    val n = toks.length - k + 1
    if (n <= 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h1 = 0L; var h2 = 0L
      var j = 0
      while (j < k) {
        if (j > 0) { // the joining space
          h1 = (h1 * B1 + 32L) % P1
          h2 = (h2 * B2 + 32L) % P2
        }
        val t = toks(i + j)
        var c = 0
        while (c < t.length) {
          val ch = t.charAt(c).toLong
          h1 = (h1 * B1 + ch) % P1
          h2 = (h2 * B2 + ch) % P2
          c += 1
        }
        j += 1
      }
      out(i) = h1 * P2 + h2
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

  final val SimHashBits = 60
  private val ACoefs: Array[Long] = Array.tabulate(SimHashBits)(aCoef)
  private val BCoefs: Array[Long] = Array.tabulate(SimHashBits)(bCoef)

  /** 60-bit portable SimHash: every token occurrence votes ±1 on bit j
    * according to the parity of `(a_j*h1 + b_j*h2 + j) mod P1`, where
    * (h1, h2) are the token's two-prime rolling hashes; bit j of the
    * result is 1 iff the vote total is strictly positive. 60 bits (not
    * 64) keeps the value, and every 2^j addend of the SQL twin, inside
    * positive signed-64 — DuckDB has no unsigned BIGINT shift-out.
    * Map-only, like [[SimHashKernels.simhash64]]. */
  def simhash60(s: UTF8String): Long = {
    val toks = s.toString.split(" ", -1)
    val votes = new Array[Int](SimHashBits)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      var h1 = 0L; var h2 = 0L
      var c = 0
      while (c < t.length) {
        val ch = t.charAt(c).toLong
        h1 = (h1 * B1 + ch) % P1
        h2 = (h2 * B2 + ch) % P2
        c += 1
      }
      var b = 0
      while (b < SimHashBits) {
        if (((ACoefs(b) * h1 + BCoefs(b) * h2 + b) % P1 & 1L) == 1L) votes(b) += 1
        else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < SimHashBits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

object SignLshKernels {
  import Portable._

  /** Centering offset: (P1-1)/2, so hyperplane components spread over
    * [-(P1-1)/2, (P1-1)/2]. */
  final val Center = (P1 - 1) / 2

  /** Band keys of a portable sign-LSH over a float embedding.
    *
    * Everything is INTEGER arithmetic so the DuckDB oracle reproduces it
    * with zero float-summation parity risk:
    *  1. quantize: q_k = floor(x_k * 1024) (same floor-is-portable
    *     argument as Similarity.quantizeInt8);
    *  2. hyperplane i component k (k 1-based): h_ik =
    *     (aCoef(i) * k + bCoef(i)) mod P1 - Center — the affine-mod walk
    *     wraps P1 roughly every other step, so components decorrelate;
    *  3. bit i = 1 iff Σ_k q_k * h_ik > 0 (an exact long: |q|≤~2^14,
    *     |h|≤2^29, d≤2^7 ⇒ |Σ| ≤ 2^50);
    *  4. band t's key packs bits [t*r, t*r+r).
    *
    * Returns `bands` longs. A null/empty embedding yields an empty array
    * (no buckets — the row simply never becomes a candidate). */
  def signLshKeys(emb: ArrayData, bitsPerBand: Int, bands: Int): ArrayData = {
    val d = emb.numElements()
    if (d == 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val q = new Array[Long](d)
    var k = 0
    while (k < d) {
      q(k) = math.floor(emb.getFloat(k).toDouble * 1024.0).toLong
      k += 1
    }
    val nBits = bitsPerBand * bands
    val keys = new Array[Long](bands)
    var i = 0
    while (i < nBits) {
      val a = aCoef(i)
      val b = bCoef(i)
      var dot = 0L
      k = 0
      while (k < d) {
        dot += q(k) * ((a * (k + 1) + b) % P1 - Center)
        k += 1
      }
      if (dot > 0) keys(i / bitsPerBand) |= (1L << (i % bitsPerBand))
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(keys)
  }
}

/** Codegen'd portable sign-LSH band keys of a float-array embedding
  * column (see [[SignLshKernels.signLshKeys]]). Replaces a seeded
  * spark.ml BucketedRandomProjectionLSH fit: no fit job, and the keys
  * are integer-exact in the DuckDB oracle. */
case class SignLshKeys(child: Expression, bitsPerBand: Int, bands: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _)
      if bitsPerBand >= 1 && bitsPerBand <= 62 && bands >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"need 1 <= bitsPerBand <= 62 and bands >= 1, got ($bitsPerBand, $bands)")
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh_keys expects array<float>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SignLshKernels.signLshKeys(input.asInstanceOf[ArrayData], bitsPerBand, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SignLshKernels$$.MODULE$$.signLshKeys($c, $bitsPerBand, $bands)")

  override protected def withNewChildInternal(newChild: Expression): SignLshKeys =
    copy(child = newChild)

  override def prettyName: String = "sign_lsh_keys"
}

object SignLshKeys {
  def apply(c: Column, bitsPerBand: Int, bands: Int): Column =
    Bridge.column(SignLshKeys(Bridge.expression(c), bitsPerBand, bands))
}

/** Codegen'd distinct portable word-k-shingle hashes (see
  * [[PortableKernels.wordShinglePolyHashes]]). Same shape and motivation
  * as [[WordShingleHashes]]; differs only in the hash basis, which this
  * variant makes SQL-reproducible for the MinHash oracle. */
case class WordShinglePolyHashes(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"k must be >= 1, got $k")
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingle_poly_hashes expects a string input, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PortableKernels.wordShinglePolyHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableKernels$$.MODULE$$.wordShinglePolyHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShinglePolyHashes =
    copy(child = newChild)

  override def prettyName: String = "word_shingle_poly_hashes"
}

object WordShinglePolyHashes {
  def apply(c: Column, k: Int): Column =
    Bridge.column(WordShinglePolyHashes(Bridge.expression(c), k))
}

/** Codegen'd 60-bit portable SimHash of a string column (see
  * [[PortableKernels.simhash60]]). Same map-only design as [[SimHash64]];
  * the portable bit derivation makes the whole pair pipeline (votes,
  * chunks, hamming) reproducible in the DuckDB oracle. */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects a string input, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    PortableKernels.simhash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableKernels$$.MODULE$$.simhash60($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)

  override def prettyName: String = "simhash60"
}

object SimHash60 {
  def apply(c: Column): Column = Bridge.column(SimHash60(Bridge.expression(c)))
}
