package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text expression helpers — all pure Catalyst expressions (codegen'd,
  * no UDFs), shared by the text-analysis and dedup operators.
  *
  * The reference's only text processing is three Python UDFs
  * (SURVEY.md §2b P11–P13); these helpers extend that surface to the
  * LLM-pipeline operators mandated by BASELINE.json (shingling, hashing,
  * fingerprinting) while staying whole-stage-codegen friendly.
  */
object Texty {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word k-shingles ("n-grams of tokens") as an array column.
    * Docs with fewer than k tokens get an empty array. */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= k,
      array_distinct(transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Polynomial rolling hash over characters: acc = (acc*31 + code) mod p.
    * Stays below 2^35 so it is overflow-safe in engines that error on
    * BIGINT overflow (unlike Java's silent wrap). Backed by the codegen'd
    * [[RollingHash]] expression (the equivalent higher-order
    * `aggregate(split(text,''),…)` form is interpreted and allocates per
    * character — it dominated the fingerprint benchmark). */
  def rollingHash(text: Column): Column = RollingHash(text)

  /** Count of tokens contained in `stop` (duplicates counted). */
  def stopCount(text: Column, stop: Seq[String]): Column = {
    val set = stop.map(lit(_))
    size(filter(tokens(text), t => t.isin(set: _*)))
  }

  /** Ratio in basis points as exact BIGINT: floor(num*10000/den), NULL
    * when den = 0 (ANSI mode would otherwise raise DIVIDE_BY_ZERO on a
    * degenerate input — e.g. a recall report over an empty corpus).
    * Used instead of rounding for oracle-checked ratios: round-half
    * semantics differ engine to engine at exact ties (e.g. 1/32), while
    * floor of the identical double is unambiguous. Oracle parity: the
    * corpus queries never hit den = 0, so the NULL branch is
    * Spark-side-robustness only. */
  def ratioBp(num: Column, den: Column): Column =
    when(den === 0, lit(null).cast("long"))
      .otherwise(floor(num * lit(10000.0) / den).cast("long"))
}
