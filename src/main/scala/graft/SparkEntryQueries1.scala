package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Portable, PortableKernels}
import graft.ops.{Dedup, Events, Features, Multimodal, Profiler, Relational, Similarity, Sketches, TextAnalysis}

/** Registered queries (part 1 of 3) — mechanical split of the
  * SparkEntry registry (round 12; no behavior change). */
trait SparkEntryQueries1 extends SparkEntryOracleHelpers2 {
  private[graft] def queriesChunk1: Map[String, (SparkSession, String) => DataFrame] = Map(
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

    // T1–T3 on the ACTUAL loan workload surface (graft.ops.LoanWorkload —
    // the drop-in API a reference user runs): the driver corpus has no
    // loan table, so a loan-shaped one is synthesized deterministically
    // from orders (the q3_3 trick) and the SAME synthesis is inlined in
    // each oracle — T1/T3 semantics become driver-oracle'd end to end
    // instead of spec-trusted. (T2's bucketHistogram and the GBK goldens
    // stay covered by q2_bucket_histogram and LoanWorkloadSpec.)
    "loan_t1" -> ((s, dir) =>
      graft.ops.LoanWorkload.t1IndustryCount(synthLoan(s, dir))),
    "loan_t3_1" -> ((s, dir) =>
      graft.ops.LoanWorkload.t3EmployerTypeRatio(synthLoan(s, dir))),
    "loan_t3_2" -> ((s, dir) =>
      graft.ops.LoanWorkload.t3TotalMoney(synthLoan(s, dir))),
    "loan_t3_3" -> ((s, dir) =>
      graft.ops.LoanWorkload.t3WorkYearFilter(synthLoan(s, dir))),

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

    // EXT left outer join: unmatched fact rows survive with nulls — the
    // null-padding semantics the registry's inner/anti joins don't touch.
    "q21_join_left" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders")
            .filter(col("o_orderpriority") === "1-URGENT")
            .select("o_custkey", "o_orderkey"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"),
          count(col("o_orderkey")).as("n_matched"),
          sum(when(col("o_orderkey").isNull, 1L).otherwise(0L))
            .as("n_no_urgent"))
        .orderBy("c_mktsegment")),

    // EXT semi join: keep-if-exists without multiplying matches.
    "q25_join_semi" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders")
            .filter(col("o_orderpriority") === "1-URGENT")
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(desc("n_customers"), asc("c_mktsegment"))),

    // EXT full outer join: both sides null-padded; the two filters of the
    // same table guarantee unmatched rows on each side.
    "q26_join_full" -> ((s, dir) => {
      val a = t(s, dir, "customer").filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey").as("k"))
      val b = t(s, dir, "customer").filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey").as("k2"))
      a.join(b, col("k") === col("k2"), "full")
        .agg(
          count(when(col("k").isNotNull && col("k2").isNotNull, 1)).as("n_both"),
          count(when(col("k2").isNull, 1)).as("n_left_only"),
          count(when(col("k").isNull, 1)).as("n_right_only"))
    }),

    // EXT set op EXCEPT (distinct semantics): urgent-only customers.
    "q22_except" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      val low = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "5-LOW").select("o_custkey")
      urgent.except(low)
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))),
          Seq("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(desc("n_customers"), asc("c_mktsegment"))
    }),

    // EXT set op UNION DISTINCT: urgent-or-high customers, deduped.
    "q24_union_distinct" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      val high = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "2-HIGH").select("o_custkey")
      urgent.union(high).distinct()
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))),
          Seq("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(desc("n_customers"), asc("c_mktsegment"))
    }),

    // EXT distinct aggregates (expand + two-phase shuffle plan).
    "q23_distinct_agg" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_custs"),
          countDistinct(year(col("o_orderdate"))).as("n_years"))
        .orderBy("o_orderpriority")),

    // EXT skew mitigation: explicit salted equi-join (the fallback for
    // skew AQE can't split — see graft.ops.Skew). Salt only refines the
    // partitioning, so the oracle is the PLAIN join: same rows exactly.
    "q18_skew_salted_join" -> ((s, dir) => {
      val fact = t(s, dir, "orders").filter(col("o_totalprice") > 50000)
      val dim = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      graft.ops.Skew.saltedJoin(fact, dim, "o_custkey", 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          Relational.moneySum(col("o_totalprice")).as("revenue"))
        .orderBy(desc("n_orders"), asc("c_mktsegment"))
    }),

    // EXT grouping sets: rollup subtotals with grouping_id.
    "q12_rollup" -> ((s, dir) =>
      Relational.rollupCounts(t(s, dir, "lineitem"),
        "l_returnflag", "l_linestatus")),

    // EXT grouping sets, full CUBE: every subtotal combination.
    "q29_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          Relational.moneySum(col("o_totalprice")).as("revenue"),
          grouping_id().cast("int").as("gid"))
        .orderBy(asc("gid"), asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority"))),

    // EXT subqueries: correlated EXISTS / NOT EXISTS through the SQL
    // surface — Catalyst decorrelates them into one semi and one anti
    // hash join on o_custkey (never a per-row re-scan).
    "q30_exists_subquery" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("g_customer")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      s.sql("""
        SELECT c_custkey, c_name FROM g_customer c
        WHERE EXISTS (SELECT 1 FROM g_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 200000)
          AND NOT EXISTS (SELECT 1 FROM g_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        ORDER BY c_custkey""")
    }),

    // EXT three-valued NOT IN semantics: the classic NULL trap as a
    // pinned behavior — a NOT IN whose subquery CAN contain NULL
    // filters everything (x <> NULL is UNKNOWN), while NOT EXISTS and
    // the NULL-purged NOT IN agree on the true anti count. An engine
    // that "fixes" NOT IN silently breaks SQL; this query pins that we
    // don't, in both engines at once.
    "q47_not_in_nulls" -> ((s, dir) => {
      t(s, dir, "customer")
        .withColumn("nullable_key",
          when(col("c_custkey") % 1000 === 0, lit(null))
            .otherwise(col("c_custkey")))
        .createOrReplaceTempView("g_nullable_cust")
      t(s, dir, "orders").createOrReplaceTempView("g_orders_nin")
      s.sql("""
        SELECT
          (SELECT count(*) FROM g_orders_nin
           WHERE o_custkey NOT IN
                 (SELECT nullable_key FROM g_nullable_cust))
            AS not_in_with_null,
          (SELECT count(*) FROM g_orders_nin
           WHERE o_custkey NOT IN
                 (SELECT nullable_key FROM g_nullable_cust
                  WHERE nullable_key IS NOT NULL))
            AS not_in_purged,
          (SELECT count(*) FROM g_orders_nin o
           WHERE NOT EXISTS (SELECT 1 FROM g_nullable_cust c
                             WHERE c.nullable_key = o.o_custkey))
            AS not_exists_cnt""")
    }),

    // EXT explicit GROUPING SETS ((flag), (status)) — the shape neither
    // rollup nor cube can express (two disjoint single-column sets).
    "q31_grouping_sets" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      s.sql("""
        SELECT l_returnflag, l_linestatus, count(*) AS cnt,
               CAST(grouping_id() AS INT) AS gid
        FROM g_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        ORDER BY gid, l_returnflag ASC NULLS FIRST,
                 l_linestatus ASC NULLS FIRST""")
    }),

    // EXT ordered funnel view -> click -> purchase: single sort-shuffle
    // state carry instead of K-1 self-joins
    "events_funnel" -> ((s, dir) => Events.funnel(t(s, dir, "events"))),

    // EXT ranking-window family: rank / dense_rank / percent_rank /
    // cume_dist over one shared spec (one shuffle). The window orders by
    // o_orderdate WITH ties so the rank-vs-dense_rank gap is actually
    // exercised; every output value is tie-order independent (pure
    // functions of the sort KEY), so the result stays deterministic.
    // percent_rank/cume_dist are small-integer ratios — IEEE division is
    // bit-identical cross-engine.
    "q32_window_ranks" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        .withColumn("rnk", rank().over(w).cast("long"))
        .withColumn("drnk", dense_rank().over(w).cast("long"))
        .withColumn("prnk", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .drop("o_orderdate")
        .orderBy("o_orderkey")
    }),

    // EXT global top-k: ORDER BY + LIMIT must plan TakeOrderedAndProject
    // (per-partition heaps + driver merge of k rows), never a full range
    // sort — the difference between shipping 20 rows and shuffling the
    // table at 100 TB. PlanShapeSpec asserts the plan.
    "q28_topk_global" -> ((s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(20)),

    // EXT set ops: customers with BOTH an urgent and a low-priority order.
    // INTERSECT semantics via single-scan conditional aggregation: the
    // literal INTERSECT plan scans orders twice and pays two distincts +
    // a join; flagging both priorities in one groupBy is one pushed-down
    // IN-scan and one shuffle. Oracle keeps the INTERSECT SQL — same rows.
    "q13_intersect" -> ((s, dir) => {
      val both = t(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy("o_custkey")
        .agg(
          max(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("u"),
          max(when(col("o_orderpriority") === "5-LOW", 1).otherwise(0)).as("l"))
        .filter(col("u") === 1 && col("l") === 1)
        .select("o_custkey")
      both.join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))),
          Seq("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(desc("n_customers"), asc("c_mktsegment"))
    }),

    // EXT pivot: order counts per segment x priority (declared values).
    "q14_pivot" -> ((s, dir) =>
      Relational.pivotCounts(
        t(s, dir, "orders")
          .join(broadcast(t(s, dir, "customer")
            .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))),
            Seq("o_custkey")),
        "c_mktsegment", "o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))),

    // EXT exact percentile aggregates (sort-based, distributed).
    "q16_percentiles" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("med"),
          expr("percentile(l_quantity, 0.9)").as("p90"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")),

    // EXT temporal scalar functions: per (year, month) order stats.
    "q17_date_parts" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("cnt"),
          Relational.moneySum(col("o_totalprice")).as("revenue"))
        .orderBy("y", "m")),

    // EXT window frames: lag + rolling 3-row sum per customer (frame
    // specs — ROWS BETWEEN — are otherwise unexercised in the registry).
    "q19_window_frames" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val w3 = w.rowsBetween(-2, 0)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .withColumn("prev_price", lag("o_totalprice", 1).over(w))
        .withColumn("sum3",
          sum(col("o_totalprice")
            .cast(org.apache.spark.sql.types.DecimalType(18, 2))).over(w3)
            .cast("double"))
        .withColumn("rn3", count(lit(1)).over(w3).cast("long"))
        .select("o_custkey", "o_orderkey", "prev_price", "sum3", "rn3")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // EXT window function: top-3 orders per customer by price.
    "q8_window_topn" -> ((s, dir) =>
      Relational.topNPerGroup(
        t(s, dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
        "o_custkey", "o_totalprice", "o_orderkey", 3)),

    // EXT time windows (batch twins of graft.streaming):
    "q9_events_tumbling" -> ((s, dir) =>
      Events.tumblingAgg(t(s, dir, "events"))),
    "q9b_events_sliding" -> ((s, dir) =>
      Events.slidingAgg(t(s, dir, "events"))),
    // semi-structured: JSON props parsed with explicit schema, aggregated
    "q11_props_json" -> ((s, dir) =>
      Events.propsFieldAgg(t(s, dir, "events"))),
    // time-series as-of join: each click sees the user's latest prior view
    "q15_asof_join" -> ((s, dir) =>
      Events.asOfJoin(t(s, dir, "events"), "click", "view")),
    // FORWARD as-of join: each click sees the user's NEXT view and the
    // gap to it — time-to-next-touch; same union-window linear shape,
    // the window just runs in descending time (no self/range join)
    "q43_asof_forward" -> ((s, dir) =>
      Events.asOfJoinForward(t(s, dir, "events"), "click", "view")),
    "q10_sessionize" -> ((s, dir) =>
      Events.sessionize(t(s, dir, "events"))),
    // batch range join via time banding: the equi-join reformulation of
    // the quadratic "views in the preceding hour" interval predicate
    "q27_range_join_banded" -> ((s, dir) =>
      Events.bandedRangeJoin(t(s, dir, "events"))),
    // interval×interval overlap join: which user pairs were active
    // concurrently — sessions explode to covered hour bands (bounded
    // in-plan), candidates meet on a band equi-join, the exact overlap
    // predicate filters; banding losslessness proven by the plain
    // quadratic oracle
    "q42_interval_overlap" -> ((s, dir) =>
      Events.sessionOverlaps(t(s, dir, "events"))),
    // REAL Structured Streaming run (file micro-batches, AvailableNow,
    // complete-mode memory sink) — equals the batch tumbling agg, so the
    // streaming family gets a driver-oracle'd row, not just specs.
    "stream_tumbling_parity" -> ((s, dir) =>
      graft.streaming.EventStream.tumblingCountsParityRun(s, s"$dir/events.parquet")),
    // sliding (overlapping) windows as a real streaming run — the
    // stateful agg holds window/slide live windows per (slot, type);
    // complete mode keeps them all, so the run equals batch slidingAgg
    "stream_sliding_parity" -> ((s, dir) =>
      graft.streaming.EventStream.slidingCountsParityRun(
        s, s"$dir/events.parquet")),
    // mapGroupsWithState per-user running totals, final state == batch agg
    // (exact integer cents — state-iterator order is not deterministic,
    // double addition is order-sensitive, cents are not)
    "stream_user_stats_parity" -> ((s, dir) =>
      graft.streaming.EventStream.userStatsParityRun(s, s"$dir/events.parquet")),
    // stream-static enrichment: per-batch broadcast dim join + stateful
    // counts, final result == the batch events × customer join
    "stream_enrich_parity" -> ((s, dir) =>
      graft.streaming.EventStream.enrichmentParityRun(
        s, s"$dir/events.parquet", t(s, dir, "customer"))),
    // flatMapGroupsWithState streaming dedup over a real AvailableNow run:
    // kept set == batch "lowest doc_id per md5 fingerprint survives"
    "stream_dedup_parity" -> ((s, dir) =>
      graft.streaming.EventStream.dedupParityRun(s, s"$dir/documents.parquet")),
    // watermarked stream-stream interval join (clicks ⋈ views within 1h),
    // real AvailableNow run; oracle = the batch interval join
    "stream_interval_join_parity" -> ((s, dir) =>
      graft.streaming.EventStream.intervalJoinParityRun(s, s"$dir/events.parquet")),
    // native session_window aggregation as a real run; oracle = batch
    // gap-sessionization with session_window's half-open boundary
    "stream_session_parity" -> ((s, dir) =>
      graft.streaming.EventStream.sessionParityRun(s, s"$dir/events.parquet")),
    // foreachBatch merge-upsert sink: 3 micro-batches each MERGE "latest
    // event per user" into versioned keyed state; final state == the
    // batch latest-per-user query however the files split into batches
    "stream_upsert_parity" -> ((s, dir) =>
      graft.streaming.EventStream.upsertParityRun(s, s"$dir/events.parquet")),
    // the admission gate DEPLOYED as a stream: document micro-batches
    // probe the persisted sig index via foreachBatch, each cycle appends
    // its admitted docs so later cycles see them as corpus; verdicts AND
    // micro-batch assignment both hash-checked by the N-cycle oracle.
    // 2 cycles — cycle 1 seeing cycle 0's admissions already proves the
    // cross-batch visibility contract; each extra cycle costs a full
    // state-store startup (the suite's priciest fixed cost)
    "stream_ingest_gate_parity" -> ((s, dir) =>
      graft.streaming.EventStream.ingestGateParityRun(
        s, s"$dir/documents.parquet", nSlices = 2)),
    // the vector twin of the ingest gate: even vec_ids are the indexed
    // corpus (vecFingerprint identity), odd ids stream in 3 micro-batches.
    // Three PLANTED duplicates force every verdict across known cycles:
    // a corpus copy (c0 exact_dup), a copy of a c0 admission arriving in
    // c2 (cross-batch index visibility), an identical pair inside c1
    // (batch_dup). The oracle replays the union + all 3 cycles in SQL.
    "stream_embed_gate_parity" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select("vec_id", "embedding")
      val planted = emb.filter(col("vec_id").isin(0L, 1L, 3L))
        .select(
          when(col("vec_id") === 0L, lit(10000003L))   // c0: dup of corpus 0
            .when(col("vec_id") === 1L, lit(10000007L)) // c2: dup of c0-admitted 1
            .otherwise(lit(10000005L)).as("vec_id"),    // c1: batch twin of 3
          col("embedding"))
      graft.streaming.EventStream.embedGateParityRun(s, emb.unionByName(planted))
    }),
    // same latest-event-per-user contract through the Spark 4 v2 state
    // API (StatefulProcessor + transformWithState on RocksDB state)
    "stream_tws_latest_parity" -> ((s, dir) =>
      graft.streaming.EventStream.twsLatestParityRun(s, s"$dir/events.parquet")),
    // ListState member of the v2 family: bounded per-user top-3 events
    "stream_tws_topk_parity" -> ((s, dir) =>
      graft.streaming.EventStream.twsTopKParityRun(s, s"$dir/events.parquet")),

    // EXT text analysis over documents:
    "text_stats" -> ((s, dir) => TextAnalysis.textStats(t(s, dir, "documents"))),
    "lang_id" -> ((s, dir) => TextAnalysis.langId(t(s, dir, "documents"))),
    // EXT language-ID eval vs the labeled lang column: full confusion
    // matrix with per-cell row-recall / column-precision and global
    // accuracy riding along — the asymmetric-confusion surface a bare
    // accuracy number hides; |langs|²-bounded agg + broadcast marginals
    "lang_id_eval" -> ((s, dir) =>
      TextAnalysis.langIdEval(t(s, dir, "documents"))),
    // EXT readability: Flesch reading ease in integer milli (vowel-run
    // syllable proxy, min-1 sentences) — the grade-level quality signal
    // beside length/stopword ratios; map-only, floor-div twin-matched
    "text_readability" -> ((s, dir) =>
      TextAnalysis.readability(t(s, dir, "documents"))),
    "token_counts" -> ((s, dir) => TextAnalysis.tokenCounts(t(s, dir, "documents"))),
    // EXT training-mix allocation: τ=1/2 temperature rebalance of a 10%
    // token budget across sources, split by exact largest remainder —
    // Σ alloc == budget asserted IN-PLAN; the share_bp − raw_share_bp
    // gap is the up-sampling a data-mixing stage applies
    "text_mix_allocation" -> ((s, dir) =>
      TextAnalysis.mixAllocation(t(s, dir, "documents"))),
    // EXT token-balanced export sharding: contiguous cuts of the exact
    // global token prefix-sum line — every shard total/S ± one doc by
    // construction; the per-shard share_bp report IS the straggler check
    "text_shard_balance" -> ((s, dir) =>
      TextAnalysis.shardBalance(t(s, dir, "documents"))),
    // EXT token-budget curation: per source, highest-uniq-ratio docs
    // greedily fill tokens div 4 (quality-first under a budget — the
    // data-constrained selection rule); per-doc kept verdict, ONE
    // source-keyed sort shuffle for prefix sum + budget together
    "text_budget_select" -> ((s, dir) =>
      TextAnalysis.budgetSelect(t(s, dir, "documents"))),
    "doc_fingerprint" -> ((s, dir) => TextAnalysis.fingerprints(t(s, dir, "documents"))),
    // fixed-size token windows with overlap (LLM context chunking)
    "doc_chunk" -> ((s, dir) => TextAnalysis.chunkTokens(t(s, dir, "documents"))),
    // PII redaction; the corpus has no PII, so deterministic email/phone
    // strings are synthesized per doc (same trick as fp_na_fill's nulls)
    // for a non-degenerate oracle: every doc gets 1 email, every 3rd a
    // phone number.
    "text_redact" -> ((s, dir) =>
      TextAnalysis.redactPii(
        t(s, dir, "documents").withColumn("text",
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com"),
            when(col("doc_id") % 3 === 0,
              format_string(" tel 555-%03d-%04d",
                col("doc_id") % 1000, col("doc_id") % 10000))
              .otherwise(lit("")))))),

    // EXT table-level privacy audit (the release gate complementing
    // text_redact's per-doc scrub): k-anonymity / l-diversity over a
    // quasi-identifier projection of customer — (nation, segment,
    // balance-kilobucket) as the QI, name as the sensitive column. One
    // hash aggregate; only the violating tail is returned.
    "privacy_k_anon" -> ((s, dir) =>
      graft.ops.Privacy.kAnonymityGroups(
        t(s, dir, "customer").withColumn("bal_kb",
          floor(col("c_acctbal") / 1000).cast("long")),
        qi = Seq("c_nationkey", "c_mktsegment", "bal_kb"),
        sensitive = "c_name", k = 5, l = 2)),

    // EXT one-row k-anonymity release report: suppression rate in bp,
    // dataset min-k/min-l — the number a data-release checklist gates on.
    "privacy_k_report" -> ((s, dir) =>
      graft.ops.Privacy.kAnonymityReport(
        t(s, dir, "customer").withColumn("bal_kb",
          floor(col("c_acctbal") / 1000).cast("long")),
        qi = Seq("c_nationkey", "c_mktsegment", "bal_kb"),
        sensitive = "c_name", k = 5, l = 2)),

    // EXT DP count release (geometric mechanism, integer-portable
    // discrete-Laplace sampler): per-nation noisy customer counts with
    // per-row epsilon stamps; the whole mechanism hash-oracle-checked
    "privacy_dp_counts" -> ((s, dir) =>
      graft.ops.Privacy.dpCounts(t(s, dir, "customer"), "c_nationkey")),

    // EXT the APPLIED suppression release: rows whose QI group passes
    // both k and l — the policy the audits report on, executed
    "privacy_suppress" -> ((s, dir) =>
      graft.ops.Privacy.kAnonymitySuppress(
        t(s, dir, "customer").withColumn("bal_kb",
          floor(col("c_acctbal") / 1000).cast("long")),
        qi = Seq("c_nationkey", "c_mktsegment", "bal_kb"),
        sensitive = "c_name", k = 5, l = 2)
        .orderBy("c_custkey")),

    // EXT DP sum release at bounded sensitivity: per-row clamp to
    // [0, 5000_00] cents, sensitivity-granular discrete-Laplace noise
    "privacy_dp_sums" -> ((s, dir) =>
      graft.ops.Privacy.dpSums(t(s, dir, "customer"), "c_nationkey",
        round(col("c_acctbal") * 100), clampMax = 500000L)),

    // EXT generalization ladder: coarsen the balance QI through
    // 1k/10k/100k/1M buckets, report each level's k-anonymity landscape
    // and the cheapest level fitting the 5% suppression budget —
    // generalize-before-suppress as a driver-checked table.
    "privacy_generalization" -> ((s, dir) =>
      graft.ops.Privacy.generalizationLadder(
        t(s, dir, "customer"),
        qiFixed = Seq("c_nationkey", "c_mktsegment"),
        numCol = "c_acctbal", sensitive = "c_name")),

    // EXT t-closeness audit: the leak l-diversity misses — per
    // (priority, year) group, TVD-in-bp between the group's
    // order-status mix and the global one, worst 20 groups first; the
    // full status domain scored per group (absent cells = p 0), all
    // integer so the gate number itself hash-oracles.
    "privacy_t_closeness" -> ((s, dir) =>
      graft.ops.Privacy.tClosenessReport(
        t(s, dir, "orders")
          .withColumn("o_year", year(col("o_orderdate")).cast("long")),
        qi = Seq("o_orderpriority", "o_year"),
        sensitive = "o_orderstatus")),

    // per-doc top-3 terms by frequency (stopword-filtered, exact tf)
    "text_top_terms" -> ((s, dir) =>
      TextAnalysis.topTerms(t(s, dir, "documents"))),

    // corpus bigram document frequencies, global top-20
    "text_bigram_df" -> ((s, dir) =>
      TextAnalysis.bigramDf(t(s, dir, "documents"))),

    // EXT cross-source vocabulary overlap: exact per-pair Jaccard in bp
    // — the mirror/re-crawl detector a corpus mix runs; (source, term)
    // collapse, then a term-keyed join bounded by |sources|^2 per term.
    "text_source_overlap" -> ((s, dir) =>
      TextAnalysis.sourceOverlap(t(s, dir, "documents"))),

    // EXT frequency-of-frequencies spectrum: hapax mass + log2 tail
    // decay + per-band vocab/token shares — the Zipf diagnostic behind
    // every vocabulary-size and pruning-threshold decision. One
    // vocabulary shuffle, then <=64-row aggregates.
    "text_freq_spectrum" -> ((s, dir) =>
      TextAnalysis.freqSpectrum(t(s, dir, "documents"))),

    // EXT collocation mining: top-30 adjacent pairs by integer lift
    // (= monotone PMI rank; occurrence counts, broadcast vocab joins,
    // minCount-5 support floor, TakeOrdered top-k)
    "text_collocations" -> ((s, dir) =>
      TextAnalysis.collocations(t(s, dir, "documents"))),

    // EXT per-source n-gram diversity (distinct-1/distinct-2 bp): the
    // templated-text / model-contamination screen per corpus slice
    "text_ngram_diversity" -> ((s, dir) =>
      TextAnalysis.ngramDiversity(t(s, dir, "documents"))),

    // EXT the same report on HLL registers (the 100 TB swap applied:
    // |strata|·1024 cells of reducer state, estimates hash-oracle'd)
    "text_ngram_diversity_hll" -> ((s, dir) =>
      TextAnalysis.ngramDiversityHll(t(s, dir, "documents"))),

    // EXACT global top-20 tokens via bounded-state Misra-Gries
    // candidates + exact rescore (no full-vocabulary shuffle); the
    // losslessness bound is asserted inside the plan.
    "text_heavy_hitters" -> ((s, dir) =>
      TextAnalysis.heavyHitters(t(s, dir, "documents"))),

    // EXT integer LM-familiarity quality score: char-trigram counts
    // trained on the corpus, documents scored by occurrence-weighted
    // corpus frequency (broadcast-probed, charset³-bounded model).
    "text_lm_familiarity" -> ((s, dir) =>
      TextAnalysis.lmFamiliarity(t(s, dir, "documents"))),

    // EXT integer BM25 retrieval: top-10 docs for a fixed literal query;
    // corpus shuffles only query-term postings, never its vocabulary.
    "search_bm25" -> ((s, dir) =>
      TextAnalysis.bm25TopK(t(s, dir, "documents"), Bm25QueryTerms)),

    // EXT PRF query expansion (Rocchio/BM25): top-3 feedback docs mine
    // the 3 heaviest non-query non-stopword terms, the corpus rescoring
    // joins the expanded set as a broadcast TABLE (never collected),
    // and the chosen expansion itself rides along as a checked column.
    "search_prf_expand" -> ((s, dir) =>
      TextAnalysis.prfExpand(t(s, dir, "documents"), Bm25QueryTerms)),

    // EXT hybrid retrieval: BM25 top-10 ∪ cosine top-10 (query = vec 0's
    // embedding) fused by integer-exact Reciprocal Rank Fusion.
    "search_hybrid" -> ((s, dir) =>
      TextAnalysis.searchHybrid(t(s, dir, "documents"),
        t(s, dir, "embeddings"), Bm25QueryTerms)),

    // EXT tokenizer-training surface: corpus-wide adjacent-char-pair
    // frequencies (the first BPE merge statistic), top-20.
    "bpe_merge_pairs" -> ((s, dir) =>
      TextAnalysis.bpePairStats(t(s, dir, "documents"))),

    // EXT distributed BPE training: the first 5 merge rounds end-to-end
    // (count pairs → global argmax → greedy rewrite, per round); the
    // oracle unrolls the loop as CTEs with scalar-subquery argmaxes.
    "bpe_train" -> ((s, dir) =>
      TextAnalysis.bpeTrain(t(s, dir, "documents"), BpeTrainMerges)),

    // EXT batched BPE training: same merge table, ~maxBatch× fewer
    // full pair-count passes (the 100 TB pass-count shape). Shares the
    // SEQUENTIAL oracle — the driver hash compare IS the equivalence
    // gate, so any batching divergence fails loudly.
    "bpe_train_batched" -> ((s, dir) =>
      TextAnalysis.bpeTrainBatched(t(s, dir, "documents"), BpeTrainMerges)),

    // EXT tokenizer application: encode the corpus with the trained
    // merges — per-doc word/char/token counts + tokens-per-char
    // compression (the token-budget statistic); one map-only corpus
    // pass after dictionary-bounded training.
    "bpe_encode" -> ((s, dir) =>
      TextAnalysis.bpeEncode(t(s, dir, "documents"), BpeTrainMerges)),

    // EXT tokenizer fertility: tokens-per-word and chars-per-token per
    // source under the trained merge table — the token-budget /
    // domain-mismatch statistic (integer milli-units).
    "bpe_fertility" -> ((s, dir) =>
      TextAnalysis.bpeFertility(t(s, dir, "documents"), BpeTrainMerges)),

    // per-doc top-3 terms by TF-IDF (integer-exact idf surrogate; corpus
    // df + N computed distributed, ReuseExchange shares the tf shuffle)
    "text_tfidf_topk" -> ((s, dir) =>
      TextAnalysis.tfidfTopTerms(t(s, dir, "documents"))),

    // Gopher-style structural quality rules, integer-exact, map-only
    "quality_filter" -> ((s, dir) =>
      TextAnalysis.qualityFilter(t(s, dir, "documents"))),

    // EXT CDC apply (merge upsert): base snapshot + synthesized I/U/D
    // change feed (updates bump every 10th key's price, deletes remove
    // every 100th), latest version wins. The corpus has no change feed,
    // so one is derived deterministically from orders itself.
    "cdc_apply" -> ((s, dir) => {
      val base = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      val updates = base.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"),
          (col("o_totalprice") + 1000.0d).as("o_totalprice"))
        .withColumn("version", lit(1L)).withColumn("op", lit("U"))
      val deletes = base.filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"), lit(0.0d).as("o_totalprice"))
        .withColumn("version", lit(2L)).withColumn("op", lit("D"))
      graft.ops.Cdc.apply(base, updates.unionByName(deletes), "o_orderkey")
        .orderBy("o_orderkey")
    }),

    // EXT SCD2 dimension build: each user's event_type as the tracked
    // attribute, events as the change feed — consecutive same-type runs
    // collapse into [valid_from, valid_to) versions, one shuffle by user
    "scd2_build" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.ops.Cdc.scd2(
        ev.withColumn("us", Events.tsUs(ev)),
        key = "user_id", attr = "event_type", orderUs = "us",
        seq = "event_id")
    }),

    // EXT dedup family over documents:
    "dedup_exact" -> ((s, dir) => Dedup.exact(t(s, dir, "documents"))),

    // EXT chunk-granular substring dedup: drop repeated 10-token chunks
    // corpus-wide (keep first occurrence), rebuild each document from
    // its surviving chunks — passage-level cleanup, not doc-level drop.
    "dedup_chunk_substrings" -> ((s, dir) =>
      Dedup.chunkDedup(t(s, dir, "documents"))),

    // EXT boilerplate strip: 10-token chunks present in >= 3 DISTINCT
    // docs removed from EVERY document (df-threshold cleanup — unlike
    // chunk dedup's keep-first), docs rebuilt from surviving chunks.
    "text_boilerplate" -> ((s, dir) =>
      Dedup.boilerplateStrip(t(s, dir, "documents"))),

    // EXT COMPOSED corpus-prep pipeline: boilerplate strip → quality
    // filter on cleaned text → exact dedup → decontaminate reps, with
    // first-failing-stage attribution per doc and the kept token budget.
    "corpus_prep" -> ((s, dir) =>
      TextAnalysis.corpusPrep(t(s, dir, "documents"))),

    // EXT per-(source, lang) corpus health report: volumes, quality pass
    // rate, exact-dup rate — integer bp, one keyed aggregation.
    "corpus_report" -> ((s, dir) =>
      TextAnalysis.corpusReport(t(s, dir, "documents"))),
    "dedup_ngram_jaccard" -> ((s, dir) => Dedup.ngramJaccard(t(s, dir, "documents"))),
    // asymmetric inclusion (doc quoted inside another): containment
    // |A∩B|/|A| ≥ 0.8 per direction — what symmetric jaccard misses
    "dedup_containment" -> ((s, dir) =>
      Dedup.containmentPairs(t(s, dir, "documents"))),
    // LOSSLESS prefix-filtered containment (inner-side-only prefix under
    // the containment bound): same answer as UNCAPPED directed
    // containment — no df-cap blindness
    "dedup_containment_prefix" -> ((s, dir) =>
      Dedup.containmentPrefix(t(s, dir, "documents"))),
    // LOSSLESS prefix-filtered exact Jaccard (AllPairs/PPJoin candidate
    // condition): same answer as UNCAPPED exact Jaccard — boilerplate
    // shingles land in rarest-first suffixes instead of being dropped
    "dedup_jaccard_prefix" -> ((s, dir) => Dedup.jaccardPrefix(t(s, dir, "documents"))),
    "dedup_minhash_lsh" -> ((s, dir) => Dedup.minhashLsh(t(s, dir, "documents"))),
    "dedup_simhash" -> ((s, dir) => Dedup.simhashPairs(t(s, dir, "documents"))),
    // near-dup pairs -> connected components -> canonical keep-id per doc
    "dedup_clusters" -> ((s, dir) =>
      Dedup.resolveClusters(Dedup.ngramJaccard(t(s, dir, "documents")))),
    // steady-state ingestion: batch (odd ids) deduped against corpus (even)
    "dedup_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.incrementalExact(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1))
    }),
  )
}
