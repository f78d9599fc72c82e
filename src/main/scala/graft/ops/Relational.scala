package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Reference-parity relational operators (SURVEY.md §2b–§2d), re-expressed
  * as pure `DataFrame => DataFrame` transforms parameterised by column
  * names, so they run on both the loan schema and the driver's testdata.
  *
  * Every reference Python UDF becomes a native Catalyst expression here —
  * fully whole-stage-codegen'd, no per-batch Python worker boundary
  * (reference inserts BatchEvalPython; see SURVEY.md §3 E2).
  */
object Relational {

  /** T1: count rows per group, sort by count desc then key asc.
    *
    * Ref: 任务一/src/main/java/test/IndustryCount.java:23-119 — two
    * MapReduce jobs (count, then total sort via a composite
    * WritableComparable, compareTo at IndustryCount.java:91-96); PySpark
    * twin at 任务二+任务三/exp4_work2+3.ipynb:75.
    *
    * Scale: one partial/final HashAggregate pair (map-side combine — the
    * ref's MR job sets no Combiner, so this is strictly less shuffle I/O)
    * plus one range exchange for the total order. Group cardinality is
    * small, so the sort exchange is trivial at any scale.
    */
  def groupCountSortDesc(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc(key))

  /** T2: histogram of a numeric column in `width`-wide buckets with the
    * reference's "(lo,hi)" labels (left-closed [lo, hi) despite the paren
    * notation).
    *
    * Ref UDFs `total_loan_classify` / `total_loan_sort`
    * (exp4_work2+3.ipynb:92-101) did a value→label→parse-label-back string
    * round-trip in Python; here the bucket is computed once as a native
    * long and the label derived from it — codegen'd, pushdown-friendly.
    */
  def bucketHistogram(df: DataFrame, v: String, width: Long): DataFrame = {
    val lo = (floor(col(v) / width) * width).cast("long")
    df.select(lo.as("bucket_lo"))
      .groupBy("bucket_lo")
      .agg(count(lit(1)).as("cnt"))
      .withColumn(
        "bucket",
        concat(lit("("), col("bucket_lo").cast("string"), lit(","),
          (col("bucket_lo") + width).cast("string"), lit(")")))
      .select("bucket", "bucket_lo", "cnt")
      .orderBy("bucket_lo")
  }

  /** T3-1: per-group share of total rows, rounded HALF_EVEN to `scale`.
    *
    * Ref (exp4_work2+3.ipynb:285-339) sums a per-row literal 1/300000 —
    * accumulating FP error (0.4543433333334228 in cell-18 output). The
    * canonical form is exact: count(*)/total as one double division of two
    * exact longs, then `bround` (ref used f.bround at :339).
    *
    * Scale: total is computed with an empty-frame window over the
    * *aggregated* groups (cardinality = #groups, tiny), not over the raw
    * rows — no second scan, no driver-side action, no wide shuffle.
    */
  def groupRatio(df: DataFrame, key: String, scale: Int = 4): DataFrame = {
    val w = Window.partitionBy()
    df.groupBy(col(key))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("ratio", bround(col("cnt") / sum("cnt").over(w), scale))
      .orderBy(desc("cnt"), asc(key))
  }

  /** T3-3 work-year parser (exp4_work2+3.ipynb:478-490; README.md:224-234):
    * null→-1, "10+"→11, "<"→0, else the leading integer of "x years".
    * Pure Catalyst when-chain — unlike the ref's Python UDF it keeps
    * predicate pushdown enabled for filters on the parsed value
    * (SURVEY.md §4).
    */
  def parseWorkYear(c: Column): Column = {
    val lead = split(c, " ").getItem(0)
    when(c.isNull, -1)
      .when(c.contains("10+"), 11)
      .when(c.contains("<"), 0)
      // digit-guarded cast: ANSI mode (Spark 4 default) makes a bare
      // cast THROW on malformed strings; unparseable input -> null
      .when(lead.rlike("^[0-9]+$"), lead.cast("int"))
  }

  /** Exact-sum helper: cast to DECIMAL(18,2) pre-agg so the sum is
    * order-independent (double summation is not associative — at 100 TB,
    * partial-agg ordering differs run to run), then surface as double. */
  def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** TPC-H Q1-shaped pricing summary over lineitem: the reference's A2/A3
    * aggregate shapes (exp4_work2+3.ipynb:75,294) generalised to multiple
    * exact aggregates per group.
    *
    * Determinism note: only *raw* 2-decimal columns are cast double→decimal
    * (unambiguous); derived money math then happens in decimal, which is
    * exact and order-independent — casting a computed double would round
    * differently engine to engine. */
  def pricingSummary(li: DataFrame): DataFrame = {
    val price = col("l_extendedprice").cast(DecimalType(18, 2))
    val disc = col("l_discount").cast(DecimalType(18, 2))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum(price * (lit(1) - disc)).cast("double").as("sum_disc_price"),
        count(lit(1)).as("cnt"))
      .orderBy(asc("l_returnflag"), asc("l_linestatus"))
  }

  /** Hierarchical subtotal counts via ROLLUP (EXT — SURVEY §2c lists
    * grouping sets as absent from the reference; a complete engine needs
    * them). grouping_id() disambiguates subtotal levels; nulls-first
    * ordering keeps the output deterministic for the oracle. One pass:
    * Spark expands rollup into a single Expand + HashAggregate, no
    * repeated scans. */
  def rollupCounts(df: DataFrame, k1: String, k2: String): DataFrame =
    df.rollup(col(k1), col(k2))
      .agg(count(lit(1)).as("cnt"), grouping_id().cast("int").as("gid"))
      .orderBy(asc("gid"), asc_nulls_first(k1), asc_nulls_first(k2))

  /** Pivot: one row per `rowKey`, one count column per (known) value of
    * `pivotCol`. Values are declared, not discovered — at scale the
    * discovery pass over a high-cardinality pivot column is the classic
    * accidental O(distinct-values) plan. */
  def pivotCounts(df: DataFrame, rowKey: String, pivotCol: String,
      values: Seq[String]): DataFrame =
    df.groupBy(col(rowKey))
      .pivot(pivotCol, values)
      .agg(count(lit(1)))
      // fill only the pivot columns: a whole-frame fill would also
      // rewrite a NULL in a numeric rowKey into 0, merging the null
      // group with a genuine key-0 group
      .na.fill(0, values)
      .orderBy(rowKey)

  /** Top-N rows per group by an order column (window row_number). Not in
    * the reference (SURVEY §2f ABSENT) — extension surface. Tie-broken on
    * a unique key for determinism. */
  def topNPerGroup(df: DataFrame, part: String, orderCol: String,
      tieKey: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(part)).orderBy(desc(orderCol), asc(tieKey))
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .orderBy(asc(part), asc("rn"))
  }

  /** Cohort LTV curves — cumulative revenue per customer by months
    * since first purchase, grouped by acquisition month: THE
    * unit-economics table ("how much is a January-acquired customer
    * worth by month 6, and are newer cohorts better"). Months are
    * integers (year·12 + month − 1), revenue exact cents, LTV a floor
    * division — hash-oracle-able end to end.
    *
    * Scale shape: one customer-keyed agg pins each customer's cohort,
    * one join back onto the fact scan (broadcast while \|customers\|
    * allows, Catalyst/AQE's call), one (cohort × age)-keyed agg, and
    * the cumulative window runs over THAT ≤ cohorts·(maxAge+1)-row
    * aggregate — never raw orders. */
  def cohortLtv(orders: DataFrame, maxAge: Int = 11): DataFrame = {
    val o = orders.select(col("o_custkey"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
        .cast("long").as("m"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val first = o.groupBy("o_custkey").agg(min("m").as("cohort_m"))
    val sizes = first.groupBy("cohort_m")
      .agg(count(lit(1)).as("cohort_size"))
    val cells = o.join(first, "o_custkey")
      .withColumn("age", col("m") - col("cohort_m"))
      .filter(col("age") <= maxAge)
      .groupBy("cohort_m", "age")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("rev_cents"))
    val w = Window.partitionBy("cohort_m").orderBy("age")
      .rowsBetween(Window.unboundedPreceding, 0)
    cells.join(broadcast(sizes), "cohort_m")
      .withColumn("cum_rev_cents", sum("rev_cents").over(w))
      .withColumn("ltv_cents", expr("cum_rev_cents div cohort_size"))
      .select("cohort_m", "age", "n_orders", "rev_cents", "cohort_size",
        "cum_rev_cents", "ltv_cents")
      .orderBy("cohort_m", "age")
  }
}
