package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArrayDot, RollingHash, SimHash60, WordShingleHashes,
  WordShinglePolyHashes}

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
    ext.injectFunction((
      new FunctionIdentifier("word_shingle_hashes"),
      info("word_shingle_hashes",
        "word_shingle_hashes(s, k) - distinct 64-bit FNV hashes of word k-shingles"),
      (children: Seq[Expression]) => {
        checkArity("word_shingle_hashes", 2, children)
        WordShingleHashes(children.head, intLit("word_shingle_hashes", children(1)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_shingle_poly_hashes"),
      info("word_shingle_poly_hashes",
        "word_shingle_poly_hashes(s, k) - distinct portable two-prime poly hashes of word k-shingles"),
      (children: Seq[Expression]) => {
        checkArity("word_shingle_poly_hashes", 2, children)
        WordShinglePolyHashes(children.head,
          intLit("word_shingle_poly_hashes", children(1)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash60"),
      info("simhash60",
        "simhash60(s) - portable 60-bit SimHash of a whitespace-tokenized string"),
      (children: Seq[Expression]) => {
        checkArity("simhash60", 1, children)
        SimHash60(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler",
        "jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1], bit-compatible with DuckDB's jaro_winkler_similarity"),
      (children: Seq[Expression]) => {
        checkArity("jaro_winkler", 2, children)
        graft.functions.JaroWinkler(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize",
        "nfc_normalize(s) - Unicode canonical composition (NFC) of a string"),
      (children: Seq[Expression]) => {
        checkArity("nfc_normalize", 1, children)
        graft.functions.NfcNormalize(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfkc_normalize"),
      info("nfkc_normalize",
        "nfkc_normalize(s) - Unicode compatibility composition (NFKC): also folds ligatures/fullwidth forms"),
      (children: Seq[Expression]) => {
        checkArity("nfkc_normalize", 1, children)
        graft.functions.UnicodeNormalize(children.head,
          java.text.Normalizer.Form.NFKC)
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      info("word_shingles",
        "word_shingles(s, k) - distinct word k-shingle strings"),
      (children: Seq[Expression]) => {
        checkArity("word_shingles", 2, children)
        graft.functions.WordShingles(children.head,
          intLit("word_shingles", children(1)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("sign_lsh_keys"),
      info("sign_lsh_keys",
        "sign_lsh_keys(v, bitsPerBand, bands) - banded random-hyperplane sign keys of a float array"),
      (children: Seq[Expression]) => {
        checkArity("sign_lsh_keys", 3, children)
        graft.functions.SignLshKeys(children.head,
          intLit("sign_lsh_keys", children(1)),
          intLit("sign_lsh_keys", children(2)))
      }))
  }

  /** The k parameter of the shingle kernels is a compile-time constant
    * of the generated code, so SQL callers must pass a literal int. */
  private def intLit(name: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name requires a literal int k, got $other")
  }
}
