package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a pure function (SparkSession, sfDir) =>
  * DataFrame over the driver corpus (TESTDATA.md). Entries with a DuckDB
  * twin in [[oracleSql]] are hash-compared by the driver at sf0.01; the
  * rest get a rows>0 check. All oracle'd queries end in a total order and
  * use exact types (BIGINT counts, DECIMAL-exact sums surfaced as double)
  * so the compare is deterministic (SURVEY.md §7 "hard parts").
  */
object SparkEntry {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * T1 semantics (group-count-sort, SURVEY §2 A1/A2/O1) on customer. */
  def entry(spark: SparkSession): DataFrame =
    Relational.groupCountSortDesc(
      t(spark, "/root/testdata/sf0.001", "customer"), "c_mktsegment")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // T1 (A1/A2/O1/O2): group-count + total sort, count desc / key asc.
    "q1_group_count_sort" -> ((s, dir) =>
      Relational.groupCountSortDesc(t(s, dir, "customer"), "c_mktsegment")),

    // T2 (P11/P12/A2/O3): 1000-wide bucket histogram, native exprs.
    "q2_bucket_histogram" -> ((s, dir) =>
      Relational.bucketHistogram(t(s, dir, "orders"), "o_totalprice", 1000L)),

    // T3-1 (A3/A4/P7/P9): per-group ratio of total, bround scale 4.
    "q3_1_group_ratio" -> ((s, dir) =>
      Relational.groupRatio(t(s, dir, "orders"), "o_orderpriority")),

    // T3-2 (P3/P6/P8): arithmetic projection (derived column), total order.
    "q3_2_derived_arithmetic" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))).as("charge"))
        .orderBy("l_orderkey", "l_linenumber")),

    // T3-3 (P13/P10): when-chain string parser + filter on parsed value.
    // A work_year-shaped string is synthesised from part.p_size so both
    // engines parse the same strings (the corpus has no work_year column).
    "q3_3_parse_filter" -> ((s, dir) => {
      val synth = when(col("p_size") % 7 === 0, lit(null))
        .when(col("p_size") >= 10, lit("10+ years"))
        .when(col("p_size") < 1, lit("< 1 year"))
        .otherwise(concat(col("p_size").cast("string"), lit(" years")))
      t(s, dir, "part")
        .withColumn("work_year", synth)
        .withColumn("work_year_num", Relational.parseWorkYear(col("work_year")))
        .filter(col("work_year_num") > 5)
        .select("p_partkey", "p_name", "work_year_num")
        .orderBy("p_partkey")
    }),

    // A2/A3 generalised: multi-aggregate pricing summary (TPC-H Q1 shape).
    "q4_pricing_summary" -> ((s, dir) =>
      Relational.pricingSummary(t(s, dir, "lineitem"))),

    // EXT joins (SURVEY §2e — absent in ref, mandated for scale):
    // broadcast-hash join of fact→small dim, then agg.
    "q5_join_broadcast" -> ((s, dir) =>
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer").select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          Relational.moneySum(col("o_totalprice")).as("revenue"))
        .orderBy(desc("n_orders"), asc("c_mktsegment"))),

    // EXT: multi-join star query (customer⋈nation⋈region dims broadcast,
    // orders fact), revenue per region.
    "q6_join_star" -> ((s, dir) =>
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer").select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_orders"),
          Relational.moneySum(col("o_totalprice")).as("revenue"))
        .orderBy(asc("r_name"))),

    // EXT: anti join — customers with no URGENT order, counted per segment.
    // (The filter is pushed below the join build side; every customer has
    // at least one order in the corpus, so an unfiltered anti is empty.)
    "q7_join_anti" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders")
            .filter(col("o_orderpriority") === "1-URGENT")
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(desc("n_customers"), asc("c_mktsegment"))),

    // EXT window function: top-3 orders per customer by price.
    "q8_window_topn" -> ((s, dir) =>
      Relational.topNPerGroup(
        t(s, dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
        "o_custkey", "o_totalprice", "o_orderkey", 3)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_group_count_sort" ->
      """SELECT c_mktsegment, count(*) AS cnt FROM customer
         GROUP BY 1 ORDER BY cnt DESC, c_mktsegment ASC""",

    "q2_bucket_histogram" ->
      """WITH b AS (SELECT CAST(floor(o_totalprice / 1000) * 1000 AS BIGINT) AS bucket_lo FROM orders)
         SELECT '(' || CAST(bucket_lo AS VARCHAR) || ',' || CAST(bucket_lo + 1000 AS VARCHAR) || ')' AS bucket,
                bucket_lo, count(*) AS cnt
         FROM b GROUP BY bucket_lo ORDER BY bucket_lo""",

    "q3_1_group_ratio" ->
      """SELECT o_orderpriority, count(*) AS cnt,
                round(count(*) / (SELECT count(*) FROM orders), 4) AS ratio
         FROM orders GROUP BY 1 ORDER BY cnt DESC, o_orderpriority ASC""",

    "q3_2_derived_arithmetic" ->
      """SELECT l_orderkey, l_linenumber,
                l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "q3_3_parse_filter" ->
      """WITH s AS (
           SELECT p_partkey, p_name,
                  CASE WHEN p_size % 7 = 0 THEN NULL
                       WHEN p_size >= 10 THEN '10+ years'
                       WHEN p_size < 1 THEN '< 1 year'
                       ELSE CAST(p_size AS VARCHAR) || ' years' END AS work_year
           FROM part),
         p AS (
           SELECT p_partkey, p_name,
                  CASE WHEN work_year IS NULL THEN -1
                       WHEN contains(work_year, '10+') THEN 11
                       WHEN contains(work_year, '<') THEN 0
                       ELSE CAST(split_part(work_year, ' ', 1) AS INT) END AS work_year_num
           FROM s)
         SELECT p_partkey, p_name, work_year_num FROM p
         WHERE work_year_num > 5 ORDER BY p_partkey""",

    "q4_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
                count(*) AS cnt
         FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""",

    "q5_join_broadcast" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY n_orders DESC, c_mktsegment ASC""",

    "q6_join_star" ->
      """SELECT r_name, count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1 ORDER BY r_name""",

    "q7_join_anti" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')
         GROUP BY 1 ORDER BY n_customers DESC, c_mktsegment ASC""",

    "q8_window_topn" ->
      """SELECT * FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders)
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
  )
}
