package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-engineering operators mirroring the reference's ML prep stage
  * (SURVEY.md §2g FP1–FP4) as oracle-checkable relational transforms.
  *
  * The reference uses `pyspark.ml.feature` estimators (StringIndexer ×8 at
  * 任务四/exp4_work4.ipynb:152-165, QuantileDiscretizer at :221, na.fill at
  * :127-128). Those estimators collect dictionaries/quantiles to the driver
  * inside `fit`; here each op is additionally expressed as a pure
  * relational transform — same semantics, SQL-twin checkable, and the
  * dictionary stays distributed (it is joined back, never collected).
  *
  * `graft.ml.Pipelines` wires the actual `spark.ml` estimators (needed for
  * model persistence + classifier input); these twins are the correctness
  * oracle for them.
  */
object Features {

  /** FP1 twin — frequency-ranked label encoding dictionary for one column:
    * index 0 = most frequent value, ties broken by value ascending
    * (StringIndexer's default `frequencyDesc` order,
    * exp4_work4.ipynb:152-165).
    *
    * Scale: the window runs over the *aggregated dictionary* (cardinality =
    * #distinct values, small by assumption of label encoding), not the raw
    * rows — the single-partition window exchange moves only the dictionary.
    */
  def stringIndexDict(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c).as("value"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("idx",
        (row_number().over(Window.orderBy(desc("cnt"), asc("value"))) - 1)
          .cast("long"))

  /** FP1 applied: append `<col>_idx` for each requested string column by
    * joining the frequency dictionary back (broadcast — dictionaries are
    * small). Equivalent to a fitted StringIndexer ×N transform. */
  def stringIndex(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (acc, c) =>
      val dict = broadcast(
        stringIndexDict(df, c).select(
          col("value").as(c), col("idx").as(s"${c}_idx")))
      acc.join(dict, Seq(c), "left")
    }

  /** FP3 twin — exact n-quantile bucketing: ntile over a total order with a
    * unique tie-break key, so both engines assign identical buckets.
    * 1-based like SQL ntile.
    *
    * Scale note: a global ntile needs a total order (single-partition
    * window) — this twin exists for oracle-checkability. The production
    * path is `graft.ml.Pipelines.quantileDiscretizer` (distributed
    * Greenwald–Khanna sketch, approximate cuts), per SURVEY §7 "hard
    * parts": approximate cut points can't be oracle'd, exact ntile can.
    */
  def ntileBucket(df: DataFrame, v: String, tieKey: String,
      n: Int, out: String = "bucket"): DataFrame =
    df.withColumn(out,
      ntile(n).over(Window.orderBy(col(v), col(tieKey))).cast("long"))

  /** FP4 — the reference's null imputation: numeric nulls → -1, string
    * nulls → "-1" (exp4_work4.ipynb:127-128, README.md:320-321). */
  def naFill(df: DataFrame): DataFrame =
    df.na.fill(-1).na.fill("-1")

  /** Stratified sampling by a label/stratum column (seeded `sampleBy`) —
    * the class-rebalancing primitive of a training-data pipeline. One
    * pass, per-row Bernoulli keyed by stratum: no shuffle at all. Exact
    * per-stratum counts vary binomially; never oracle'd. */
  def stratifiedSample(df: DataFrame, stratum: String,
      fractions: Map[Any, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(col(stratum), fractions, seed)
}
