package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Portable, PortableKernels}
import graft.ops.{Dedup, Events, Features, Multimodal, Profiler, Relational, Similarity, Sketches, TextAnalysis}

/** Oracle SQL registrations (part 2 of 3) — mechanical split of the
  * SparkEntry registry (round 12; no behavior change). */
trait SparkEntryOracles2 extends SparkEntryOracles1 {
  private[graft] def oracleChunk2: Map[String, String] = Map(
    "sketch_kmv_setops" -> kmvSetOpsOracle,
    "sketch_ams_f2" -> amsF2Oracle,
    "stream_ams_parity" -> amsOracleFor("events", "user_id"),
    "sketch_hist_quantiles" -> histQuantilesOracle,

    // the merge law IS the identity under test (the hll_union
    // discipline): the oracle derives the quantiles from the histogram
    // of the concatenated slices — bucket-wise count addition makes the
    // merged sketch equal it exactly, so diff_upper must be 0
    "sketch_hist_merge" ->
      s"""WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                      AS cents
                   FROM lineitem WHERE l_linenumber IN (1, 2)),
         hb AS (SELECT least(4095, greatest(0, (cents - 0) // 4096))
                  AS bucket, count(*) AS cnt
                FROM c GROUP BY 1),
         cum AS (SELECT bucket, CAST(sum(cnt) OVER (ORDER BY bucket)
                                     AS BIGINT) AS cum
                 FROM hb),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM hb),
         qs AS (SELECT CAST(unnest([5000, 9000]) AS BIGINT) AS q_bp)
         SELECT q_bp, CAST(min(bucket) AS BIGINT) AS bucket,
                CAST((min(bucket) + 1) * 4096 - 1 AS BIGINT) AS est_upper,
                max(n_total) AS n_total,
                CAST((min(bucket) + 1) * 4096 - 1 AS BIGINT) AS union_upper,
                CAST(0 AS BIGINT) AS diff_upper
         FROM qs CROSS JOIN cum CROSS JOIN tot
         WHERE cum * 10000 >= q_bp * n_total
         GROUP BY 1 ORDER BY 1""",
    "sketch_join_size" -> joinSizeOracle,
    "events_mad_outliers" -> madOracle,

    // the verdict row exists IFF the in-plan rank-ε assert held, so the
    // twin is the trivially-true shape: one gate_ok=1 row per event_type
    "events_winsorize_gate" ->
      """SELECT event_type, CAST(1 AS BIGINT) AS gate_ok
         FROM events GROUP BY 1 ORDER BY 1""",

    // the same quad-hash (hllOracleFor's h expression) ranked per source
    "fp_bottomk_stratified" -> {
      import graft.functions.Portable.{P1, P2, aCoef, bCoef}
      import graft.ops.Sketches.HllSeedBase
      val (a1, b1) = (aCoef(HllSeedBase), bCoef(HllSeedBase))
      val (a2, b2) = (aCoef(HllSeedBase + 1), bCoef(HllSeedBase + 1))
      s"""WITH d AS (SELECT DISTINCT source, CAST(doc_id AS BIGINT) AS k
         |           FROM documents),
         | q AS (SELECT source, k, k % $P1 AS q1, k % $P2 AS q2 FROM d),
         | h AS (SELECT source, k,
         |              ((((q1 * q1) % $P1) * $a1 + q1 * $b1) % $P1) * $P2
         |              + (((q2 * q2) % $P2) * $a2 + q2 * $b2) % $P2 AS h
         |       FROM q),
         | r AS (SELECT source, k AS doc_id, h,
         |              CAST(row_number() OVER (PARTITION BY source
         |                ORDER BY h, k) AS BIGINT) AS rn
         |       FROM h)
         |SELECT source, doc_id, h, rn FROM r WHERE rn <= 20
         |ORDER BY source, rn""".stripMargin
    },

    // the committed snapshots re-derived from the base table: v1 is the
    // keyed subset, v2 the full table
    "snapshot_time_travel" ->
      """SELECT CAST(1 AS BIGINT) AS version, count(*) AS cnt,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS revenue
         FROM orders WHERE o_orderkey % 3 <> 0
         UNION ALL
         SELECT CAST(2 AS BIGINT), count(*),
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         FROM orders
         ORDER BY version""",

    // weighted bins: sum of token counts per 4-char length bin, then
    // the same covering-bin selection
    "sketch_hist_weighted" ->
      """WITH d AS (SELECT n_chars,
                           CAST(len(string_split(text, ' ')) AS BIGINT)
                             AS n_tok
                    FROM documents),
          hb AS (SELECT least(1023, greatest(0, (n_chars - 0) // 4))
                          AS bucket,
                        CAST(sum(n_tok) AS BIGINT) AS cnt
                 FROM d GROUP BY 1),
          cum AS (SELECT bucket, CAST(sum(cnt) OVER (ORDER BY bucket)
                                      AS BIGINT) AS cum
                  FROM hb),
          tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM hb),
          qs AS (SELECT CAST(unnest([2500, 5000, 9000]) AS BIGINT) AS q_bp)
         SELECT q_bp, CAST(min(bucket) AS BIGINT) AS bucket,
                CAST(0 + (min(bucket) + 1) * 4 - 1 AS BIGINT) AS est_upper,
                max(n_total) AS n_total
         FROM qs CROSS JOIN cum CROSS JOIN tot
         WHERE cum * 10000 >= q_bp * n_total
         GROUP BY 1 ORDER BY 1""",

    // one-row sum-merged stream state ≡ the batch conditional aggregate
    "stream_dq_parity" ->
      """SELECT count(*) AS n_rows,
                CAST(sum(CASE WHEN value > 400 THEN 1 ELSE 0 END) AS BIGINT)
                  AS v_gt400,
                CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS v_neg,
                CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS v_null_type
         FROM events""",

    // the MV indistinguishability contract: full recompute over events
    "snapshot_incremental_mv" ->
      """SELECT user_id, count(*) AS cnt,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                  AS sum_cents,
                min(epoch_us(ts)) AS min_us, max(epoch_us(ts)) AS max_us
         FROM events GROUP BY 1 ORDER BY user_id""",

    // token-mass shares per half, full-outer merged, top-20 |delta|
    "text_vocab_drift" ->
      """WITH ta AS (SELECT unnest(string_split(text, ' ')) AS tk
                     FROM documents WHERE doc_id % 2 = 0),
          ca AS (SELECT tk, count(*) AS cnt FROM ta WHERE tk <> ''
                 GROUP BY 1),
          sa AS (SELECT tk, (cnt * 10000)
                   // (SELECT sum(cnt) FROM ca) AS share_a_bp FROM ca),
          tb AS (SELECT unnest(string_split(text, ' ')) AS tk
                 FROM documents WHERE doc_id % 2 <> 0),
          cb AS (SELECT tk, count(*) AS cnt FROM tb WHERE tk <> ''
                 GROUP BY 1),
          sb AS (SELECT tk, (cnt * 10000)
                   // (SELECT sum(cnt) FROM cb) AS share_b_bp FROM cb),
          m AS (SELECT coalesce(sa.tk, sb.tk) AS tk,
                       CAST(coalesce(share_a_bp, 0) AS BIGINT) AS share_a_bp,
                       CAST(coalesce(share_b_bp, 0) AS BIGINT) AS share_b_bp
                FROM sa FULL JOIN sb ON sa.tk = sb.tk)
         SELECT tk, share_a_bp, share_b_bp,
                abs(share_a_bp - share_b_bp) AS drift_bp
         FROM m ORDER BY drift_bp DESC, tk LIMIT 20""",

    // quantile_cont at quarter ranks ×4 ≡ percentile ×4, all integers
    "events_quartiles" ->
      """WITH c AS (SELECT event_type,
                           CAST(round(value * 100) AS BIGINT) AS c
                    FROM events)
         SELECT event_type, count(*) AS n,
                CAST(4 * quantile_cont(c, 0.25) AS BIGINT) AS p25_cents4,
                CAST(4 * quantile_cont(c, 0.5) AS BIGINT) AS p50_cents4,
                CAST(4 * quantile_cont(c, 0.75) AS BIGINT) AS p75_cents4
         FROM c GROUP BY 1 ORDER BY event_type""",

    // lag gaps in (ts, event_id) order; quantile_cont ×2 vs percentile ×2
    "events_interarrival" ->
      """WITH g AS (SELECT user_id,
                           epoch_us(ts) - lag(epoch_us(ts))
                             OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS gap
                    FROM events)
         SELECT user_id, count(*) AS n_gaps,
                min(gap) AS min_gap_us, max(gap) AS max_gap_us,
                CAST(2 * quantile_cont(gap, 0.5) AS BIGINT) AS med_gap_us2
         FROM g WHERE gap IS NOT NULL
         GROUP BY 1 ORDER BY user_id""",

    // events_funnel's CTE chain with the RANGE-frame EXISTS carry: a
    // stage hit converts iff a valid prior-stage hit lies in
    // us ∈ [event − 24h, event − 1] (strictly earlier, within gap)
    "events_funnel_timed" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us
           FROM events WHERE event_type IN ('view','click','purchase')),
         w0 AS (SELECT *, CASE WHEN event_type = 'view' THEN us END AS h0
                FROM e),
         c1 AS (SELECT *, max(h0)
                  OVER (PARTITION BY user_id ORDER BY us
                        RANGE BETWEEN 86400000000 PRECEDING
                                  AND 1 PRECEDING)
                  AS carry_1
                FROM w0),
         w1 AS (SELECT *, CASE WHEN event_type = 'click'
                                AND carry_1 IS NOT NULL
                               THEN us END AS h1
                FROM c1),
         c2 AS (SELECT *, max(h1)
                  OVER (PARTITION BY user_id ORDER BY us
                        RANGE BETWEEN 86400000000 PRECEDING
                                  AND 1 PRECEDING)
                  AS carry_2
                FROM w1),
         w2 AS (SELECT *, CASE WHEN event_type = 'purchase'
                                AND carry_2 IS NOT NULL
                               THEN us END AS h2
                FROM c2),
         per_user AS (
           SELECT user_id,
                  max(CASE WHEN h0 IS NOT NULL THEN 1 ELSE 0 END) AS s_0,
                  max(CASE WHEN h1 IS NOT NULL THEN 1 ELSE 0 END) AS s_1,
                  max(CASE WHEN h2 IS NOT NULL THEN 1 ELSE 0 END) AS s_2
           FROM w2 GROUP BY 1),
         t AS (SELECT COALESCE(CAST(sum(s_0) AS BIGINT), 0) AS n_0,
                      COALESCE(CAST(sum(s_1) AS BIGINT), 0) AS n_1,
                      COALESCE(CAST(sum(s_2) AS BIGINT), 0) AS n_2
               FROM per_user)
         SELECT * FROM (
           SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage,
                  n_0 AS n_users FROM t
           UNION ALL SELECT 2, 'view>click', n_1 FROM t
           UNION ALL SELECT 3, 'view>click>purchase', n_2 FROM t)
         ORDER BY stage_idx""",

    // exactness contract: the pruned versioned read ≡ the plain band
    // filter over everything committed (all of orders)
    "snapshot_pruned_read" ->
      """SELECT o_orderpriority, count(*) AS cnt,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS revenue
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1997-07-01'
         GROUP BY 1 ORDER BY o_orderpriority""",

    // the erased table ≡ the base table minus the predicate
    "snapshot_delete" ->
      """SELECT count(*) AS cnt,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS revenue
         FROM orders WHERE NOT (o_custkey % 97 = 0)""",

    // snapshot_wap: main after publish = the base table plus the
    // audited branch batch
    "snapshot_wap" ->
      """WITH a AS (SELECT o_orderkey, o_totalprice FROM orders
                    UNION ALL
                    SELECT o_orderkey, o_totalprice FROM orders
                    WHERE o_orderkey % 11 = 0)
         SELECT count(*) AS cnt,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS revenue
         FROM a""",

    // snapshot_add_column: the evolved table re-derived — v1 rows with
    // a NULL band, the appended batch with its computed band
    "snapshot_add_column" ->
      """WITH v1 AS (SELECT o_orderkey, o_totalprice,
                            CAST(NULL AS BIGINT) AS o_band
                     FROM orders),
          app AS (SELECT o_orderkey, o_totalprice,
                         CAST(o_orderkey % 7 AS BIGINT) AS o_band
                  FROM orders WHERE o_orderkey % 3 = 0),
          a AS (SELECT * FROM v1 UNION ALL SELECT * FROM app)
         SELECT count(*) AS cnt,
                CAST(count(o_band) AS BIGINT) AS n_band,
                CAST(sum(o_band) AS BIGINT) AS band_sum,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS revenue
         FROM a""",

    // snapshot_merge: the merged table re-derived relationally —
    // survivors with rewritten priorities plus the offset-key inserts
    "snapshot_merge" ->
      """WITH surv AS (SELECT o_totalprice,
                              CASE WHEN o_orderkey % 7 = 0
                                   THEN 'X-MERGED'
                                   ELSE o_orderpriority END AS prio
                       FROM orders WHERE o_custkey % 101 <> 0),
          ins AS (SELECT o_totalprice, 'X-NEW' AS prio
                  FROM orders WHERE o_orderkey % 13 = 0),
          allr AS (SELECT * FROM surv UNION ALL SELECT * FROM ins)
         SELECT count(*) AS cnt,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS revenue,
                CAST(sum(CASE WHEN prio = 'X-MERGED' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_merged,
                CAST(sum(CASE WHEN prio = 'X-NEW' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_new
         FROM allr""",

    // compaction is pure physical reorganization: the read-back must
    // aggregate to the plain table's numbers; file counts are fixed by
    // the construction (5 single-file appends -> 2 compacted files)
    // snapshot_vacuum: the GC outcome in closed form — 4 single-file
    // commits, keep 2, so 2 manifests + 2 orphaned data files go; v3
    // (o_orderkey % 4 <= 2) still time-travels
    "snapshot_vacuum" ->
      """SELECT (SELECT count(*) FROM orders) AS cnt,
                (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                             AS DOUBLE) FROM orders) AS revenue,
                CAST(4 AS BIGINT) AS versions_before,
                CAST(2 AS BIGINT) AS versions_after,
                CAST(4 AS BIGINT) AS data_files_before,
                CAST(2 AS BIGINT) AS data_files_after,
                (SELECT count(*) FROM orders WHERE o_orderkey % 4 <= 2)
                  AS cnt_prev""",

    "snapshot_compaction" ->
      """SELECT count(*) AS cnt,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS revenue,
                CAST(5 AS BIGINT) AS files_before,
                CAST(2 AS BIGINT) AS files_after
         FROM orders""",

    // sim_brute_topk's ranking CTEs twice (full vs [1:16] prefix), then
    // a per-query set intersection in integers
    "ann_recall_matryoshka" ->
      """WITH base AS (
           SELECT vec_id, embedding::DOUBLE[] AS v,
                  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
           FROM embeddings),
         tb AS (
           SELECT vec_id, embedding[1:16]::DOUBLE[] AS v,
                  sqrt(list_dot_product(embedding[1:16]::DOUBLE[],
                                        embedding[1:16]::DOUBLE[])) AS nrm
           FROM embeddings),
         fullk AS (
           SELECT q_id, vec_id FROM (
             SELECT q.vec_id AS q_id, b.vec_id,
                    row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY list_dot_product(b.v, q.v) / (b.nrm * q.nrm) DESC,
                               b.vec_id ASC) AS rnk
             FROM base b JOIN base q ON q.vec_id < 20 AND b.vec_id <> q.vec_id)
           WHERE rnk <= 10),
         prek AS (
           SELECT q_id, vec_id FROM (
             SELECT q.vec_id AS q_id, b.vec_id,
                    row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY list_dot_product(b.v, q.v) / (b.nrm * q.nrm) DESC,
                               b.vec_id ASC) AS rnk
             FROM tb b JOIN tb q ON q.vec_id < 20 AND b.vec_id <> q.vec_id)
           WHERE rnk <= 10),
         j AS (SELECT coalesce(f.q_id, p.q_id) AS q_id,
                      CASE WHEN f.vec_id IS NOT NULL AND p.vec_id IS NOT NULL
                           THEN 1 ELSE 0 END AS cap
               FROM fullk f FULL JOIN prek p
                 ON f.q_id = p.q_id AND f.vec_id = p.vec_id)
         SELECT q_id, CAST(sum(cap) AS BIGINT) AS n_captured,
                (CAST(sum(cap) AS BIGINT) * 10000) // 10 AS recall_bp
         FROM j GROUP BY 1 ORDER BY q_id""",

    // the dedup_clusters recursive-CTE closure + the quality_filter
    // integer columns + the same three-key argmax
    "dedup_keep_best" ->
      """WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
         sh AS (SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS s
                FROM tok, LATERAL (SELECT unnest(range(1, len(arr) - 1)) AS i) r
                WHERE len(arr) >= 3),
         kept AS (SELECT doc_id, s FROM sh
                  WHERE s IN (SELECT s FROM sh GROUP BY s HAVING count(*) <= 100)),
         n AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY 1),
         com AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
                 FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
         pairs AS (
           SELECT da, db FROM com
           JOIN n na ON na.doc_id = da JOIN n nb ON nb.doc_id = db
           WHERE CAST(floor(c * 10000.0 / (na.n_sh + nb.n_sh - c)) AS BIGINT) >= 5000),
         sym AS (SELECT da AS src, db AS dst FROM pairs
                 UNION ALL SELECT db, da FROM pairs),
         reach AS (
           SELECT src AS a, src AS b FROM sym
           UNION
           SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src),
         clu AS (SELECT a AS doc_id, min(b) AS cluster_id
                 FROM reach GROUP BY 1),
         q AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                      CAST(floor(len(list_distinct(string_split(text, ' '))) * 10000.0
                           / len(string_split(text, ' '))) AS BIGINT) AS uniq_ratio_bp
               FROM documents),
         j AS (SELECT clu.cluster_id, clu.doc_id, q.n_tokens, q.uniq_ratio_bp,
                      row_number() OVER (PARTITION BY clu.cluster_id
                        ORDER BY q.uniq_ratio_bp DESC, q.n_tokens DESC,
                                 clu.doc_id) AS rn,
                      count(*) OVER (PARTITION BY clu.cluster_id) AS n_members
               FROM clu JOIN q ON q.doc_id = clu.doc_id)
         SELECT cluster_id, doc_id AS keep_id,
                CAST(n_members AS BIGINT) AS n_members, uniq_ratio_bp, n_tokens
         FROM j WHERE rn = 1 ORDER BY cluster_id""",

    // two lags on the same (ts, event_id) user window; full tie-break
    "events_paths_top" ->
      """WITH o AS (SELECT user_id, event_type,
                           lag(event_type, 2) OVER w AS t1,
                           lag(event_type, 1) OVER w AS t2
                    FROM events
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT t1, t2, event_type AS t3, count(*) AS cnt
         FROM o WHERE t1 IS NOT NULL AND t2 IS NOT NULL
         GROUP BY 1, 2, 3
         ORDER BY cnt DESC, t1, t2, t3 LIMIT 10""",

    // the same integer moments; pmod ≡ % on non-negative epoch-us
    "events_covariance" ->
      """WITH e AS (SELECT event_type,
                           CAST(round(value * 100) AS BIGINT) AS x,
                           (epoch_us(ts) % 86400000000) // 60000000 AS y
                    FROM events),
          m AS (SELECT event_type, count(*) AS n,
                       CAST(sum(x) AS BIGINT) AS sum_x,
                       CAST(sum(y) AS BIGINT) AS sum_y,
                       CAST(sum(x * y) AS BIGINT) AS sum_xy
                FROM e GROUP BY 1)
         SELECT event_type, n, sum_x, sum_y,
                n * sum_xy - sum_x * sum_y AS cov_scaled
         FROM m ORDER BY event_type""",

    // lag window in (ts, event_id) order; row shares as floor-div bp

    "events_transitions" ->
      """WITH o AS (SELECT user_id, event_type,
                           lag(event_type) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_type
                    FROM events),
          p AS (SELECT prev_type, event_type AS next_type, count(*) AS cnt
                FROM o WHERE prev_type IS NOT NULL GROUP BY 1, 2),
          t AS (SELECT prev_type, CAST(sum(cnt) AS BIGINT) AS row_total
                FROM p GROUP BY 1)
         SELECT p.prev_type, p.next_type, p.cnt,
                (p.cnt * 10000) // t.row_total AS share_bp
         FROM p JOIN t USING (prev_type)
         ORDER BY prev_type, next_type""",

    // grouped twin of stream_hist_parity's hist SQL, partitioned
    // cumulative window + per-group covering-bin selection
    "sketch_hist_groups" ->
      """WITH c AS (SELECT event_type,
                           CAST(round(value * 100) AS BIGINT) AS cents
                    FROM events),
          hb AS (SELECT event_type,
                        least(1023, greatest(0, (cents - 0) // 64)) AS bucket,
                        count(*) AS cnt
                 FROM c GROUP BY 1, 2),
          cum AS (SELECT event_type, bucket,
                         CAST(sum(cnt) OVER (PARTITION BY event_type
                           ORDER BY bucket) AS BIGINT) AS cum
                  FROM hb),
          tot AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_total
                  FROM hb GROUP BY 1),
          qs AS (SELECT CAST(unnest([5000, 9500]) AS BIGINT) AS q_bp)
         SELECT cum.event_type AS event_type, q_bp,
                CAST(min(cum.bucket) AS BIGINT) AS bucket,
                CAST(0 + (min(cum.bucket) + 1) * 64 - 1 AS BIGINT)
                  AS est_upper,
                max(tot.n_total) AS n_total
         FROM qs CROSS JOIN cum
         JOIN tot ON tot.event_type = cum.event_type
         WHERE cum.cum * 10000 >= q_bp * tot.n_total
         GROUP BY 1, 2 ORDER BY event_type, q_bp""",

    // the scd2_build version CTEs + the half-open-window as-of join
    "scd2_temporal_join" ->
      """WITH ordered AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                  lag(event_type) OVER w AS prev,
                  row_number() OVER w AS rn
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         runs AS (
           SELECT user_id, event_id, event_type, us FROM ordered
           WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
         v AS (
           SELECT user_id, event_type AS state, us AS valid_from_us,
                  lead(us) OVER (PARTITION BY user_id
                    ORDER BY us, event_id) AS valid_to_us
           FROM runs),
         f AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
               FROM events)
         SELECT v.state, f.event_type, count(*) AS cnt
         FROM f JOIN v ON f.user_id = v.user_id
                      AND f.us >= v.valid_from_us
                      AND (v.valid_to_us IS NULL OR f.us < v.valid_to_us)
         GROUP BY 1, 2 ORDER BY state, event_type""",

    // every rule recomputed as plain SQL: CASE sums for checks,
    // count − count(DISTINCT) for uniqueness, NOT EXISTS for FKs
    "dq_expectations" ->
      """WITH o AS (SELECT count(*) AS n,
                CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
                CAST(sum(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
                count(o_orderkey) - count(DISTINCT o_orderkey) AS v_uniq
         FROM orders),
        c AS (SELECT count(*) AS n,
                CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_bal,
                count(c_custkey) - count(DISTINCT c_custkey) AS v_uniq
              FROM customer),
        l AS (SELECT count(*) AS n,
                CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS v_qty
              FROM lineitem),
        e AS (SELECT count(*) AS n,
                CAST(sum(CASE WHEN value > 400 THEN 1 ELSE 0 END) AS BIGINT) AS v_val
              FROM events),
        d AS (SELECT count(*) AS n,
                CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT) AS v_nc
              FROM documents)
        SELECT 'check:orders.o_custkey_not_null' AS rule, n AS n_checked, v_null AS n_violations FROM o
        UNION ALL SELECT 'check:orders.o_totalprice_positive', n, v_price FROM o
        UNION ALL SELECT 'unique:orders.o_orderkey', n, v_uniq FROM o
        UNION ALL SELECT 'check:customer.c_acctbal_non_negative', n, v_bal FROM c
        UNION ALL SELECT 'unique:customer.c_custkey', n, v_uniq FROM c
        UNION ALL SELECT 'check:lineitem.l_quantity_1_50', n, v_qty FROM l
        UNION ALL SELECT 'check:events.value_le_400', n, v_val FROM e
        UNION ALL SELECT 'check:documents.n_chars_consistent', n, v_nc FROM d
        UNION ALL SELECT 'fk:orders.o_custkey->customer.c_custkey',
               (SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL),
               (SELECT count(*) FROM orders o2 WHERE o2.o_custkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM customer c2
                                WHERE c2.c_custkey = o2.o_custkey))
        UNION ALL SELECT 'fk:lineitem.l_orderkey->orders.o_orderkey',
               (SELECT count(*) FROM lineitem WHERE l_orderkey IS NOT NULL),
               (SELECT count(*) FROM lineitem l2 WHERE l2.l_orderkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM orders o3
                                WHERE o3.o_orderkey = l2.l_orderkey))
        ORDER BY rule""",

    // dq_suggest: the same profile recomputed column by column; enum
    // domains via string_agg with an EXPLICIT ORDER BY over a
    // pre-deduped subquery (the q41 discipline tightened: a pre-SORTED
    // subquery alone is not honored under DuckDB's parallel
    // aggregation — observed flaky locally), gates as WHERE clauses on
    // the UNION ALL branches. Only rules that hold are emitted.
    "dq_suggest" ->
      """WITH p AS (SELECT count(*) AS n_rows,
                CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_ok,
                count(DISTINCT o_orderkey) AS nd_ok,
                CAST(min(o_orderkey) AS BIGINT) AS mn_ok,
                CAST(max(o_orderkey) AS BIGINT) AS mx_ok,
                CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_ck,
                count(DISTINCT o_custkey) AS nd_ck,
                CAST(min(o_custkey) AS BIGINT) AS mn_ck,
                CAST(max(o_custkey) AS BIGINT) AS mx_ck,
                CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_st,
                count(DISTINCT o_orderstatus) AS nd_st,
                CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_pr,
                count(DISTINCT o_orderpriority) AS nd_pr
         FROM orders),
        dom_st AS (SELECT string_agg(v, ',' ORDER BY v) AS dom FROM (
            SELECT DISTINCT o_orderstatus AS v FROM orders
            WHERE o_orderstatus IS NOT NULL)),
        dom_pr AS (SELECT string_agg(v, ',' ORDER BY v) AS dom FROM (
            SELECT DISTINCT o_orderpriority AS v FROM orders
            WHERE o_orderpriority IS NOT NULL))
        SELECT * FROM (
          SELECT 'o_orderkey' AS col_name, 'not_null' AS rule, n_rows,
                 nn_ok AS n_null, nd_ok AS n_distinct, '' AS details
          FROM p WHERE nn_ok = 0
          UNION ALL SELECT 'o_orderkey', 'unique', n_rows, nn_ok, nd_ok, ''
          FROM p WHERE n_rows > nn_ok AND nd_ok = n_rows - nn_ok
          UNION ALL SELECT 'o_orderkey', 'range', n_rows, nn_ok, nd_ok,
                 mn_ok || '..' || mx_ok
          FROM p WHERE n_rows > nn_ok
          UNION ALL SELECT 'o_custkey', 'not_null', n_rows, nn_ck, nd_ck, ''
          FROM p WHERE nn_ck = 0
          UNION ALL SELECT 'o_custkey', 'unique', n_rows, nn_ck, nd_ck, ''
          FROM p WHERE n_rows > nn_ck AND nd_ck = n_rows - nn_ck
          UNION ALL SELECT 'o_custkey', 'range', n_rows, nn_ck, nd_ck,
                 mn_ck || '..' || mx_ck
          FROM p WHERE n_rows > nn_ck
          UNION ALL SELECT 'o_orderstatus', 'not_null', n_rows, nn_st, nd_st, ''
          FROM p WHERE nn_st = 0
          UNION ALL SELECT 'o_orderstatus', 'unique', n_rows, nn_st, nd_st, ''
          FROM p WHERE n_rows > nn_st AND nd_st = n_rows - nn_st
          UNION ALL SELECT 'o_orderstatus', 'enum', n_rows, nn_st, nd_st,
                 (SELECT dom FROM dom_st)
          FROM p WHERE nd_st > 0 AND nd_st <= 12
          UNION ALL SELECT 'o_orderpriority', 'not_null', n_rows, nn_pr, nd_pr, ''
          FROM p WHERE nn_pr = 0
          UNION ALL SELECT 'o_orderpriority', 'unique', n_rows, nn_pr, nd_pr, ''
          FROM p WHERE n_rows > nn_pr AND nd_pr = n_rows - nn_pr
          UNION ALL SELECT 'o_orderpriority', 'enum', n_rows, nn_pr, nd_pr,
                 (SELECT dom FROM dom_pr)
          FROM p WHERE nd_pr > 0 AND nd_pr <= 12)
        ORDER BY col_name, rule""",

    // dq_benford: identical digit/cents arithmetic, VALUES constant
    // table for the pre-floored Benford millis
    "dq_benford" ->
      """WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
                             AS cents
                    FROM orders),
          d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1)
                            AS BIGINT) AS digit,
                       CAST(count(*) AS BIGINT) AS n
                FROM c WHERE cents > 0 GROUP BY 1),
          t AS (SELECT CAST(sum(CASE WHEN cents > 0 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_pos,
                       CAST(sum(CASE WHEN cents <= 0 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_dropped
                FROM c),
          b(bd, benford_milli) AS (VALUES (1, 301), (2, 176), (3, 124),
                 (4, 96), (5, 79), (6, 66), (7, 57), (8, 51), (9, 45)),
          per AS (SELECT d.digit, d.n,
                         d.n * 1000 // t.n_pos AS share_milli,
                         CAST(b.benford_milli AS BIGINT) AS benford_milli,
                         CAST(abs(d.n * 1000 // t.n_pos
                                  - b.benford_milli) AS BIGINT)
                           AS dev_milli,
                         t.n_dropped
                  FROM d JOIN b ON b.bd = d.digit CROSS JOIN t)
         SELECT digit, n, share_milli, benford_milli, dev_milli,
                n_dropped,
                CAST(sum(dev_milli) OVER () AS BIGINT) AS total_dev_milli
         FROM per ORDER BY digit""",

    // dq_key_skew: sorted-rank Gini identity + heaviest-key shares
    "dq_key_skew" ->
      """WITH c AS (SELECT CAST(user_id AS BIGINT) AS k,
                           CAST(count(*) AS BIGINT) AS cnt
                    FROM events GROUP BY 1),
          r AS (SELECT k, cnt,
                       CAST(row_number() OVER (ORDER BY cnt, k)
                            AS BIGINT) AS rank
                FROM c),
          t AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
                       CAST(sum(cnt) AS BIGINT) AS n_rows,
                       CAST(sum(rank * cnt) AS BIGINT) AS rank_mass,
                       CAST(max(cnt) AS BIGINT) AS max_cnt
                FROM r),
          su AS (SELECT n_keys, n_rows,
                        (2 * rank_mass - (n_keys + 1) * n_rows) * 10000
                          // (n_keys * n_rows) AS gini_bp,
                        max_cnt * 10000 // n_rows AS max_share_bp
                 FROM t)
         SELECT r.k AS user_id, r.cnt,
                r.cnt * 10000 // su.n_rows AS share_bp,
                su.n_keys, su.n_rows, su.gini_bp, su.max_share_bp
         FROM r CROSS JOIN su
         ORDER BY r.cnt DESC, user_id LIMIT 10""",

    // dq_drift: shared clamped $20k-cent buckets, floor-bp shares,
    // TVD = sum|delta| div 2 and L-inf riding along on every row
    "dq_drift" ->
      """WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
                           CASE WHEN epoch_us(o_orderdate)
                                     < 883612800000000 THEN 0 ELSE 1 END
                             AS side
                    FROM orders),
          c AS (SELECT least(24, greatest(0, v // 2000000)) AS bucket,
                       CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_ref,
                       CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_cur
                FROM o GROUP BY 1),
          t AS (SELECT CAST(sum(n_ref) AS BIGINT) AS nr,
                       CAST(sum(n_cur) AS BIGINT) AS nc FROM c),
          p AS (SELECT bucket, n_ref, n_cur,
                       n_ref * 10000 // nr AS ref_bp,
                       n_cur * 10000 // nc AS cur_bp,
                       abs(n_cur * 10000 // nc - n_ref * 10000 // nr)
                         AS delta_bp
                FROM c CROSS JOIN t),
          w AS (SELECT CAST(sum(delta_bp) AS BIGINT) // 2 AS tvd_bp,
                       CAST(max(delta_bp) AS BIGINT) AS linf_bp FROM p)
         SELECT bucket, n_ref, n_cur, ref_bp, cur_bp, delta_bp,
                tvd_bp, linf_bp
         FROM p CROSS JOIN w ORDER BY bucket""",

    // running-max window in arrival (event_id) order, strictly prior rows
    "events_order_audit" ->
      """WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS us
                    FROM events),
          x AS (SELECT event_type, us,
                       max(us) OVER (PARTITION BY event_type ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                         AS prior_max
                FROM e)
         SELECT event_type, count(*) AS n_events,
                CAST(sum(CASE WHEN prior_max > us THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_late,
                CAST(coalesce(max(CASE WHEN prior_max > us
                                       THEN prior_max - us END), 0)
                     AS BIGINT) AS max_lateness_us
         FROM x GROUP BY 1 ORDER BY event_type""",

    // events_seasonal: floor-mean baseline per (type, hour-of-day),
    // summed absolute deviation per (type, day), top 30
    "events_seasonal" ->
      """WITH t AS (SELECT event_type,
                           CAST(round(value * 100) AS BIGINT) AS c,
                           (epoch_us(ts) // 3600000000) % 24 AS hod,
                           epoch_us(ts) // 86400000000 AS day
                    FROM events),
          b AS (SELECT event_type, hod,
                       CAST(sum(c) // count(*) AS BIGINT) AS mean_c
                FROM t GROUP BY 1, 2),
          s AS (SELECT t.event_type, t.day, count(*) AS n_events,
                       CAST(sum(abs(t.c - b.mean_c)) AS BIGINT) AS sad_cents
                FROM t JOIN b ON b.event_type = t.event_type
                             AND b.hod = t.hod
                GROUP BY 1, 2)
         SELECT event_type, day, n_events, sad_cents FROM s
         ORDER BY sad_cents DESC, event_type, day LIMIT 30""",

    // events_attribution: the same IGNORE NULLS carry window, channel
    // rollup and floor share
    "events_attribution" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                           event_type,
                           CAST(round(value * 100) AS BIGINT) AS c,
                           CASE WHEN event_type = 'purchase' THEN 1
                                ELSE 0 END AS is_conv
                    FROM events),
          t AS (SELECT *, last_value(CASE WHEN is_conv = 0
                                          THEN event_type END IGNORE NULLS)
                       OVER (PARTITION BY user_id
                             ORDER BY us, is_conv, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS touch
                FROM e),
          g AS (SELECT coalesce(touch, '(none)') AS channel,
                       count(*) AS n_conversions,
                       CAST(sum(c) AS BIGINT) AS rev_cents
                FROM t WHERE is_conv = 1 GROUP BY 1),
          tot AS (SELECT sum(rev_cents) AS tot FROM g)
         SELECT channel, n_conversions, rev_cents,
                CAST(rev_cents * 10000 // tot AS BIGINT) AS rev_share_bp
         FROM g CROSS JOIN tot ORDER BY rev_cents DESC, channel""",

    // events_ar_coeffs: the same day collapse + lagged self-join
    "events_ar_coeffs" ->
      """WITH d AS (SELECT event_type,
                           epoch_us(ts) // 86400000000 AS day,
                           CAST(count(*) AS BIGINT) AS x
                    FROM events GROUP BY 1, 2),
          j AS (SELECT a.event_type, t.lag,
                       a.x AS y, b.x AS xlag
                FROM d a
                CROSS JOIN range(1, 8) t(lag)
                JOIN d b ON b.event_type = a.event_type
                        AND b.day = a.day - t.lag),
          g AS (SELECT event_type, CAST(lag AS BIGINT) AS lag,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(xlag) AS BIGINT) AS sx,
                       CAST(sum(y) AS BIGINT) AS sy,
                       CAST(sum(xlag * xlag) AS BIGINT) AS sxx,
                       CAST(sum(y * xlag) AS BIGINT) AS sxy
                FROM j GROUP BY 1, 2)
         SELECT event_type, lag, n, sx, sy, sxx, sxy,
                -- FLOOR division: DuckDB's // truncates toward zero on
                -- negatives, so subtract the positive mod first (the
                -- Spark side's pmod identity)
                CASE WHEN n * sxx - sx * sx <> 0
                     THEN ((n * sxy - sx * sy) * 1000
                           - ((((n * sxy - sx * sy) * 1000)
                               % (n * sxx - sx * sx)
                               + (n * sxx - sx * sx))
                              % (n * sxx - sx * sx)))
                          // (n * sxx - sx * sx) END AS slope_milli
         FROM g ORDER BY event_type, lag""",

    // events_stickiness: the same (month, day, user) collapse; month
    // fields are tz-free (Spark session is UTC, parquet ts is naive)
    "events_stickiness" ->
      """WITH triple AS (SELECT DISTINCT
                           CAST(year(ts) * 12 + month(ts) - 1 AS BIGINT)
                             AS m,
                           epoch_us(ts) // 86400000000 AS day, user_id
                         FROM events),
          d AS (SELECT m, day, CAST(count(*) AS BIGINT) AS dau
                FROM triple GROUP BY 1, 2),
          dd AS (SELECT m, CAST(sum(dau) AS BIGINT) AS dau_sum,
                        CAST(count(*) AS BIGINT) AS n_days
                 FROM d GROUP BY 1),
          mm AS (SELECT m, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
                 FROM triple GROUP BY 1)
         SELECT dd.m, n_days, dau_sum // n_days AS avg_dau, mau,
                dau_sum * 10000 // (n_days * mau) AS stickiness_bp
         FROM dd JOIN mm ON mm.m = dd.m ORDER BY dd.m""",

    // events_attribution_position: same journey segmentation, the
    // U-shaped 2/1/…/1/2 weights, and the telescoping floor-division
    // credit (rev·cumw//W − rev·cumw_prev//W) — conserves exactly
    "events_attribution_position" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                           event_type,
                           CAST(round(value * 100) AS BIGINT) AS c,
                           CASE WHEN event_type = 'purchase' THEN 1
                                ELSE 0 END AS is_conv
                    FROM events),
          j AS (SELECT *, COALESCE(sum(is_conv)
                       OVER (PARTITION BY user_id
                             ORDER BY us, is_conv, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS jid
                FROM e),
          conv AS (SELECT user_id, jid, c AS rev_cents
                   FROM j WHERE is_conv = 1),
          t AS (SELECT user_id, jid, event_type,
                       row_number() OVER (PARTITION BY user_id, jid
                                          ORDER BY us, event_id) AS p,
                       count(*) OVER (PARTITION BY user_id, jid) AS n
                FROM j WHERE is_conv = 0),
          cr AS (SELECT t.event_type, conv.rev_cents,
                        CASE WHEN p = 1 OR p = n THEN 2 ELSE 1 END AS w,
                        sum(CASE WHEN p = 1 OR p = n THEN 2 ELSE 1 END)
                          OVER (PARTITION BY t.user_id, t.jid ORDER BY p
                                ROWS UNBOUNDED PRECEDING) AS cumw,
                        CASE WHEN n >= 2 THEN n + 2 ELSE 2 END AS bigw
                 FROM t JOIN conv ON conv.user_id = t.user_id
                                 AND conv.jid = t.jid),
          agg AS (SELECT event_type AS channel,
                         CAST(count(*) AS BIGINT) AS n_touches,
                         CAST(sum(rev_cents * cumw // bigw
                                  - rev_cents * (cumw - w) // bigw)
                              AS BIGINT) AS credit_cents
                  FROM cr GROUP BY 1),
          nn AS (SELECT '(none)' AS channel,
                        CAST(count(*) AS BIGINT) AS n_touches,
                        CAST(sum(rev_cents) AS BIGINT) AS credit_cents
                 FROM conv LEFT JOIN (SELECT DISTINCT user_id, jid
                                      FROM t) tt
                   ON tt.user_id = conv.user_id AND tt.jid = conv.jid
                 WHERE tt.user_id IS NULL
                 HAVING count(*) > 0)
         SELECT * FROM agg UNION ALL SELECT * FROM nn
         ORDER BY credit_cents DESC, channel""",

    // events_forecast_baseline: the same day-arithmetic joins
    "events_forecast_baseline" ->
      """WITH d AS (SELECT event_type,
                           epoch_us(ts) // 86400000000 AS day,
                           CAST(count(*) AS BIGINT) AS x
                    FROM events GROUP BY 1, 2)
         SELECT a.event_type, count(*) AS n_days,
                CAST(sum(abs(a.x - s.x)) AS BIGINT) // count(*)
                  AS mae_seasonal,
                CAST(sum(abs(a.x - n.x)) AS BIGINT) // count(*)
                  AS mae_naive,
                CASE WHEN CAST(sum(abs(a.x - s.x)) AS BIGINT) // count(*)
                          <= CAST(sum(abs(a.x - n.x)) AS BIGINT)
                             // count(*)
                     THEN 'seasonal' ELSE 'naive' END AS winner
         FROM d a JOIN d s ON s.event_type = a.event_type
                          AND s.day = a.day - 7
                  JOIN d n ON n.event_type = a.event_type
                          AND n.day = a.day - 1
         GROUP BY 1 ORDER BY a.event_type""",

    // events_rolling_distinct: the same fan-out — each active day
    // covers 7 report days, trimmed at the corpus's last active day
    "events_rolling_distinct" ->
      """WITH a AS (SELECT DISTINCT event_type, user_id,
                           epoch_us(ts) // 86400000000 AS day
                    FROM events),
          m AS (SELECT max(day) AS max_day FROM a),
          f AS (SELECT event_type, user_id,
                       unnest(range(day, day + 7)) AS d
                FROM a)
         SELECT f.event_type, f.d AS day,
                count(DISTINCT f.user_id) AS n_active
         FROM f CROSS JOIN m WHERE f.d <= m.max_day
         GROUP BY 1, 2 ORDER BY event_type, day""",

    // events_concurrency: sweep line with a plain global running sum
    // (the oracle may centralize; the engine must not)
    "events_concurrency" ->
      """WITH marked AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
                  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                       THEN 1 ELSE 0 END AS is_new
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         numbered AS (
           SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
           FROM marked),
         ses AS (SELECT user_id, session_idx, min(us) AS start_us,
                        max(us) AS end_us
                 FROM numbered GROUP BY 1, 2),
         b AS (SELECT t, CAST(sum(d) AS BIGINT) AS delta FROM (
             SELECT start_us AS t, 1 AS d FROM ses
             UNION ALL SELECT end_us + 1, -1 FROM ses)
           GROUP BY 1 HAVING sum(d) <> 0),
         tl AS (SELECT t, delta,
                       CAST(sum(delta) OVER (ORDER BY t
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
                         AS concurrency
                FROM b),
         pk AS (SELECT max(concurrency) AS peak FROM tl)
         SELECT tl.t, tl.delta, tl.concurrency, pk.peak
         FROM tl CROSS JOIN pk
         ORDER BY concurrency DESC, t LIMIT 20""",

    // events_lifecycle: the same lag/lead classification in SQL
    "events_lifecycle" ->
      """WITH a AS (SELECT DISTINCT user_id,
                           epoch_us(ts) // 86400000000 AS day
                    FROM events),
          c AS (SELECT user_id, day,
                       lag(day) OVER w AS prev_day,
                       lead(day) OVER w AS next_day
                FROM a
                WINDOW w AS (PARTITION BY user_id ORDER BY day)),
          m AS (SELECT max(day) AS max_day FROM a),
          k AS (SELECT day,
                       CASE WHEN prev_day IS NULL THEN 'new'
                            WHEN prev_day = day - 1 THEN 'retained'
                            ELSE 'resurrected' END AS kind,
                       next_day
                FROM c),
          pd AS (SELECT day, CAST(count(*) AS BIGINT) AS n_active,
                        CAST(sum(CASE WHEN kind = 'new' THEN 1 ELSE 0
                                 END) AS BIGINT) AS n_new,
                        CAST(sum(CASE WHEN kind = 'retained' THEN 1
                                 ELSE 0 END) AS BIGINT) AS n_retained,
                        CAST(sum(CASE WHEN kind = 'resurrected' THEN 1
                                 ELSE 0 END) AS BIGINT) AS n_resurrected
                 FROM k GROUP BY 1),
          ch AS (SELECT k.day + 1 AS day,
                        CAST(count(*) AS BIGINT) AS n_churned
                 FROM k CROSS JOIN m
                 WHERE k.day < m.max_day
                   AND (k.next_day IS NULL OR k.next_day > k.day + 1)
                 GROUP BY 1)
         SELECT pd.day, pd.n_active, pd.n_new, pd.n_retained,
                pd.n_resurrected,
                coalesce(ch.n_churned, 0) AS n_churned
         FROM pd LEFT JOIN ch ON ch.day = pd.day
         ORDER BY pd.day""",

    // events_pareto: SQL ntile twin + the same 10-row cumulative
    "events_pareto" ->
      """WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
                    FROM events GROUP BY 1),
          d AS (SELECT CAST(ntile(10) OVER (ORDER BY n_events, user_id)
                            AS BIGINT) AS decile,
                       n_events
                FROM u),
          g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
                       CAST(sum(n_events) AS BIGINT) AS n_events
                FROM d GROUP BY 1),
          t AS (SELECT CAST(sum(n_events) AS BIGINT) AS tot FROM g)
         SELECT g.decile, g.n_users, g.n_events,
                g.n_events * 10000 // t.tot AS share_bp,
                CAST(sum(g.n_events) OVER (ORDER BY g.decile DESC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  * 10000 // t.tot AS cum_share_bp
         FROM g CROSS JOIN t ORDER BY g.decile DESC""",

    // events_cusum: the same prefix-scan spelling — running residual
    // sum and clamped running min over the per-type day series
    "events_cusum" ->
      """WITH d AS (SELECT event_type,
                           epoch_us(ts) // 86400000000 AS day,
                           count(*) AS x
                    FROM events GROUP BY 1, 2),
          b AS (SELECT event_type,
                       CAST(sum(x) // count(*) AS BIGINT) AS mu
                FROM d GROUP BY 1),
          p AS (SELECT d.event_type, d.day, CAST(d.x AS BIGINT) AS x,
                       b.mu,
                       CAST(sum(d.x - b.mu) OVER w AS BIGINT) AS p
                FROM d JOIN b ON b.event_type = d.event_type
                WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day
                             ROWS UNBOUNDED PRECEDING)),
          s AS (SELECT *, p - least(0, min(p) OVER
                            (PARTITION BY event_type ORDER BY day
                             ROWS UNBOUNDED PRECEDING)) AS s
                FROM p)
         SELECT event_type, day, x, mu, p, s,
                CAST(CASE WHEN s > 25 THEN 1 ELSE 0 END AS BIGINT)
                  AS is_alarm
         FROM s ORDER BY event_type, day""",

    // events_xcorr: zero-filled hourly series, lag sweep −6..6, exact
    // integer dot + centered numerator (inner join ≡ zero-fill for
    // products; lags with no overlapping hours coalesce to dot = 0)
    "events_xcorr" ->
      """WITH e AS (SELECT event_type,
                           epoch_us(ts) // 3600000000 AS h
                    FROM events),
          r AS (SELECT max(h) - min(h) + 1 AS hh FROM e),
          a AS (SELECT h, count(*) AS ca FROM e
                WHERE event_type = 'click' GROUP BY 1),
          b AS (SELECT h, count(*) AS cb FROM e
                WHERE event_type = 'purchase' GROUP BY 1),
          l AS (SELECT range AS lag FROM range(-6, 7)),
          d AS (SELECT l.lag, CAST(sum(a.ca * b.cb) AS BIGINT) AS dot
                FROM l JOIN a ON true JOIN b ON b.h = a.h + l.lag
                GROUP BY 1),
          s AS (SELECT (SELECT CAST(sum(ca) AS BIGINT) FROM a) AS sa,
                       (SELECT CAST(sum(cb) AS BIGINT) FROM b) AS sb,
                       (SELECT hh FROM r) AS hh)
         SELECT l.lag, coalesce(d.dot, 0) AS dot,
                s.hh * coalesce(d.dot, 0) - s.sa * s.sb AS cov_scaled
         FROM l LEFT JOIN d ON d.lag = l.lag CROSS JOIN s
         ORDER BY l.lag""",

    // events_rfm: ntile(5) with the user_id tie-break — SQL ntile's
    // uneven-bucket rule (first N mod n buckets take the extra row) is
    // exactly what rangeNtileBucket replicates
    "events_rfm" ->
      """WITH b AS (SELECT user_id, max(epoch_us(ts)) AS last_us,
                           count(*) AS n_events,
                           CAST(sum(CAST(round(value * 100) AS BIGINT))
                                AS BIGINT) AS tot_cents
                    FROM events GROUP BY 1),
          g AS (SELECT max(last_us) AS mx FROM b),
          s AS (SELECT user_id,
                       (mx - last_us) // 86400000000 AS recency_days,
                       n_events, tot_cents,
                       CAST(ntile(5) OVER (ORDER BY last_us, user_id)
                            AS BIGINT) AS r_score,
                       CAST(ntile(5) OVER (ORDER BY n_events, user_id)
                            AS BIGINT) AS f_score,
                       CAST(ntile(5) OVER (ORDER BY tot_cents, user_id)
                            AS BIGINT) AS m_score
                FROM b CROSS JOIN g)
         SELECT user_id, recency_days, n_events, tot_cents,
                r_score, f_score, m_score,
                r_score * 100 + f_score * 10 + m_score AS rfm
         FROM s ORDER BY user_id""",

    // the evolution rule inlined over the base table: even keys are
    // generation 1 (no priority column -> default), odd keys carry it
    "source_schema_evolution" ->
      """SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'UNKNOWN'
                     ELSE o_orderpriority END AS o_orderpriority,
                count(*) AS cnt,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS revenue
         FROM orders GROUP BY 1 ORDER BY o_orderpriority""",

    // the search_bm25 scoring fragments re-used per term-partition, plus
    // the density-relevance CASE and the exact 2520/rank
    "search_mrr_eval" -> {
      val terms = MrrQueryTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH dl AS (
           SELECT doc_id,
                  len(list_filter(string_split(text, ' '), x -> x <> '')) AS dl
           FROM documents),
         st AS (SELECT count(*) AS n_docs, sum(dl) // count(*) AS avgdl FROM dl),
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
                WHERE term IN ($terms) GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         scored AS (
           SELECT t.term, t.doc_id, t.tf,
                  CAST(
                    (((10000 * st.n_docs) // df.df) * t.tf * (12000 + 10000))
                    // (t.tf * 10000 +
                       (12000 * (10000 - 7500 + (7500 * dl.dl) // st.avgdl)) // 10000)
                  AS BIGINT) AS score_bp
           FROM tf t JOIN df USING (term) JOIN dl USING (doc_id), st),
         rnk AS (SELECT term, doc_id, tf, score_bp,
                        CAST(row_number() OVER (PARTITION BY term
                          ORDER BY score_bp DESC, doc_id) AS BIGINT) AS rnk
                 FROM scored),
         top AS (SELECT * FROM rnk WHERE rnk <= 10)
         SELECT term, min(CASE WHEN tf >= 3 THEN rnk END) AS best_rank,
                count(*) AS n_ranked,
                coalesce(2520 // min(CASE WHEN tf >= 3 THEN rnk END),
                         CAST(0 AS BIGINT)) AS rr_scaled
         FROM top GROUP BY 1 ORDER BY term"""
    },

    // power-of-two decay: cents << (30 − capped age); day = floor of
    // epoch-us (the events_streaks day convention, proven portable)
    "events_decay_agg" ->
      """WITH e AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
                           epoch_us(ts) // 86400000000 AS day FROM events),
          a AS (SELECT max(day) AS as_of FROM e)
         SELECT user_id, count(*) AS n_events,
                CAST(sum(cents << CAST(30 - least(as_of - day, 30) AS INT))
                     AS BIGINT) AS decay_scaled
         FROM e CROSS JOIN a GROUP BY 1 ORDER BY user_id""",

    // the streamed-and-committed table must BE the source, row for row
    "stream_snapshot_parity" ->
      """SELECT event_id, user_id, event_type,
                CAST(round(value * 100) AS BIGINT) AS cents
         FROM events ORDER BY event_id""",

    // streamed bin table ≡ batch hist, then the same covering-bin
    // quantile selection as sketch_hist_quantiles at the events-value
    // geometry (1024 × 64-cent bins)
    "stream_hist_parity" ->
      """WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents
                    FROM events),
          hb AS (SELECT least(1023, greatest(0, (cents - 0) // 64)) AS bucket,
                        count(*) AS cnt
                 FROM c GROUP BY 1),
          cum AS (SELECT bucket, CAST(sum(cnt) OVER (ORDER BY bucket)
                                      AS BIGINT) AS cum
                  FROM hb),
          tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM hb),
          qs AS (SELECT CAST(unnest([2500, 5000, 7500, 9900]) AS BIGINT)
                          AS q_bp)
         SELECT q_bp, CAST(min(bucket) AS BIGINT) AS bucket,
                CAST(0 + (min(bucket) + 1) * 64 - 1 AS BIGINT) AS est_upper,
                max(n_total) AS n_total
         FROM qs CROSS JOIN cum CROSS JOIN tot
         WHERE cum * 10000 >= q_bp * n_total
         GROUP BY 1 ORDER BY 1""",
    // the streaming run must land on EXACTLY the batch sketch — same
    // generated twin, pointed at the stream's source table
    "stream_hll_parity" -> hllOracleFor("events", "event_id"),

    // stream_bitmap_parity: streamed word table == batch word table bit
    // for bit, so the oracle is the batch bitmap + the exact distinct
    "stream_bitmap_parity" ->
      """WITH w AS (SELECT event_type,
                           CAST(user_id AS BIGINT) // 32 AS widx,
                           bit_or(CAST(1 AS BIGINT)
                                  << CAST(user_id % 32 AS INTEGER)) AS word
                    FROM events GROUP BY 1, 2)
         SELECT w.event_type,
                CAST(count(*) AS BIGINT) AS n_words,
                CAST(sum(bit_count(word)) AS BIGINT) AS n_distinct,
                CAST((SELECT count(DISTINCT user_id) FROM events e
                      WHERE e.event_type = w.event_type) AS BIGINT)
                  AS true_distinct
         FROM w GROUP BY 1 ORDER BY 1""",
    "graph_bfs" -> bfsOracle,
    "fp_pps_sample" -> ppsOracle,

    // the manifest/pruning machinery changes which FILES are opened, not
    // which rows qualify — the oracle is the band filter the result must
    // exactly equal (SketchesSpec asserts the skipping itself)
    "manifest_prune" ->
      """SELECT o_orderpriority, count(*) AS cnt,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1997-07-01'
         GROUP BY 1 ORDER BY o_orderpriority""",

    // the Bloom pass is pruning plumbing with zero false negatives and
    // an exact downstream join — the oracle is the plain semi join it
    // must be indistinguishable from (SketchesSpec covers the filter
    // mechanics themselves)
    "join_bloom_prune" ->
      """SELECT o_orderpriority, count(*) AS cnt,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer
                             WHERE c_mktsegment = 'BUILDING')
         GROUP BY 1 ORDER BY o_orderpriority""",

    // same MV contract for the JOIN identity: the oracle is the full
    // (A∪ΔA) ⋈ (B∪ΔB) recompute — any delta-algebra double count or
    // miss hash-fails
    "mv_join_incremental" ->
      """SELECT c.c_mktsegment, count(*) AS n_orders,
                CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2)))
                     AS DOUBLE) AS revenue
         FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
         GROUP BY 1 ORDER BY c.c_mktsegment""",

    // the MV correctness contract: merged partial aggregates must be
    // indistinguishable from the full recompute — so the oracle IS the
    // full recompute
    "mv_incremental" ->
      """SELECT user_id, count(*) AS cnt,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
                min(epoch_us(ts)) AS min_us, max(epoch_us(ts)) AS max_us
         FROM events GROUP BY 1 ORDER BY user_id""",

    "events_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id,
                           epoch_us(ts) // 86400000000 AS day FROM events),
         isl AS (SELECT user_id, day,
                        day - row_number() OVER (PARTITION BY user_id
                                                 ORDER BY day) AS island
                 FROM d),
         runs AS (SELECT user_id, island, count(*) AS len
                  FROM isl GROUP BY 1, 2)
         SELECT user_id, count(*) AS n_streaks,
                CAST(max(len) AS BIGINT) AS longest_streak,
                CAST(sum(len) AS BIGINT) AS active_days
         FROM runs GROUP BY 1 ORDER BY user_id""",

    // two independent Jaro-Winkler implementations (the codegen kernel
    // vs DuckDB's) must agree on every rounded basis-point score — the
    // same cross-engine discipline as dedup_unicode_nfc. ASCII-bound on
    // the oracle side only (DuckDB scores bytes; the corpus is ASCII).
    // The blocking (two passes, deterministic cap) is replicated
    // structurally so a capped run still hash-matches.
    "er_fuzzy_match" ->
      s"""WITH $ErPairCtes
         SELECT q_key, cand_key, jw_bp FROM er_scored
         WHERE jw_bp >= 9000
         ORDER BY q_key, cand_key""",

    // the blocked JW pairs resolved to connected components — the same
    // recursive-CTE min-reachable-id construction as dedup_clusters
    "er_clusters" ->
      s"""WITH RECURSIVE $ErPairCtes,
         pairs AS (SELECT q_key AS da, cand_key AS db FROM er_scored
                   WHERE jw_bp >= 9000 AND q_key <> cand_key),
         sym AS (SELECT da AS src, db AS dst FROM pairs
                 UNION ALL SELECT db, da FROM pairs),
         reach AS (
           SELECT src AS a, src AS b FROM sym
           UNION
           SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src)
         SELECT a AS entity_key, min(b) AS cluster_id
         FROM reach GROUP BY 1 ORDER BY entity_key""",

    // sorted-neighborhood: one global row_number over the merged
    // (entities + dirty queries) list, neighbor probe = rank-band join
    "er_sorted_neighborhood" ->
      s"""WITH $ErCorpusCtes,
         u AS (SELECT name, 'e' AS side, cand_key AS key FROM e
               UNION ALL SELECT dirty, 'q', q_key FROM qd),
         ranked AS (SELECT *, row_number()
                      OVER (ORDER BY name, side, key) AS rn
                    FROM u),
         qr AS (SELECT key AS q_key, name AS dirty, rn FROM ranked
                WHERE side = 'q'),
         er AS (SELECT key AS cand_key, name, rn FROM ranked
                WHERE side = 'e')
         SELECT qr.q_key, er.cand_key,
                CAST(round(jaro_winkler_similarity(qr.dirty, er.name)
                           * 10000) AS BIGINT) AS jw_bp
         FROM qr JOIN er ON er.rn BETWEEN qr.rn - 10 AND qr.rn + 10
         WHERE CAST(round(jaro_winkler_similarity(qr.dirty, er.name)
                          * 10000) AS BIGINT) >= 9000
         ORDER BY q_key, cand_key""",

    // er_golden_record: survivorship rules replicated with rank
    // windows (length-desc-then-name, cnt-desc-then-category)
    "er_golden_record" ->
      """WITH orig AS (
           SELECT c_custkey AS cluster_key, c_name AS name,
                  CAST(round(c_acctbal * 100) AS BIGINT) AS amount,
                  c_mktsegment AS category
           FROM customer),
         t1 AS (SELECT cluster_key,
                       substring(name, 1, length(name) - 2) AS name,
                       CAST(NULL AS BIGINT) AS amount, category
                FROM orig WHERE cluster_key % 7 = 0),
         t2 AS (SELECT cluster_key, name, amount - 100 AS amount,
                       'DUP' AS category
                FROM orig WHERE cluster_key % 14 = 0),
         rec AS (SELECT * FROM orig UNION ALL SELECT * FROM t1
                 UNION ALL SELECT * FROM t2),
         base AS (SELECT cluster_key,
                         CAST(count(*) AS BIGINT) AS n_members,
                         CAST(max(amount) AS BIGINT) AS amount,
                         CAST(sum(CASE WHEN amount IS NULL THEN 1
                                       ELSE 0 END) AS BIGINT)
                           AS n_null_amount
                  FROM rec GROUP BY 1),
         nm AS (SELECT cluster_key, name FROM (
                  SELECT cluster_key, name,
                         row_number() OVER (PARTITION BY cluster_key
                           ORDER BY length(name) DESC, name) AS rn
                  FROM rec) WHERE rn = 1),
         md AS (SELECT cluster_key, category FROM (
                  SELECT cluster_key, category,
                         row_number() OVER (PARTITION BY cluster_key
                           ORDER BY cnt DESC, category) AS rn
                  FROM (SELECT cluster_key, category, count(*) AS cnt
                        FROM rec WHERE category IS NOT NULL
                        GROUP BY 1, 2)) WHERE rn = 1)
         SELECT b.cluster_key, b.n_members, nm.name, b.amount,
                b.n_null_amount, md.category
         FROM base b JOIN nm USING (cluster_key)
                     LEFT JOIN md USING (cluster_key)
         ORDER BY cluster_key""",

    "er_block_stats" ->
      s"""WITH e AS (SELECT p_partkey AS cand_key,
                           p_name || '-' || CAST(p_partkey % 1000 AS VARCHAR) AS name
                    FROM part),
         ebl AS (SELECT 'p' AS pass, substring(name, 1, $ErPrefixLen) AS blk,
                        cand_key FROM e
                 UNION ALL
                 SELECT 's', right(name, $ErSuffixLen), cand_key FROM e),
         sz AS (SELECT pass, blk, count(*) AS sz FROM ebl GROUP BY 1, 2)
         SELECT pass, count(*) AS n_blocks,
                CAST(sum(sz) AS BIGINT) AS n_entities,
                max(sz) AS max_block,
                CAST(sum(greatest(sz - $ErMaxBlock, 0)) AS BIGINT) AS n_dropped
         FROM sz GROUP BY pass ORDER BY pass""",

    "corpus_mix" ->
      """WITH s AS (SELECT source, count(*) AS n_docs,
                           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
                    FROM documents GROUP BY 1),
         t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM s)
         SELECT source, n_docs, n_tokens,
                CAST(floor(n_tokens * 10000.0 / total) AS BIGINT) AS share_bp
         FROM s CROSS JOIN t ORDER BY source""",

    "q9_events_tumbling" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us, event_type,
                count(*) AS cnt,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY win_start_us, event_type""",

    // the streaming run must equal the batch tumbling aggregate exactly
    "stream_tumbling_parity" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us, event_type,
                count(*) AS cnt,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY win_start_us, event_type""",

    // the streaming sliding run must equal the batch sliding aggregate
    // (each event fans out to its two covering 1h/30min windows)
    "stream_sliding_parity" ->
      """WITH e AS (SELECT epoch_us(ts) AS us, event_type, value FROM events),
         w AS (
           SELECT (us // 1800000000) * 1800000000 AS win_start_us, event_type, value FROM e
           UNION ALL
           SELECT (us // 1800000000) * 1800000000 - 1800000000 AS win_start_us, event_type, value FROM e)
         SELECT win_start_us, event_type, count(*) AS cnt,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM w GROUP BY 1, 2 ORDER BY win_start_us, event_type""",

    // stream-static enrichment final counts == the batch dim join
    "stream_enrich_parity" ->
      """SELECT c.c_mktsegment AS segment, e.event_type, count(*) AS cnt
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY 1, 2 ORDER BY 1, 2""",

    // final mapGroupsWithState state must equal the batch per-user agg;
    // cents = round(value*100) summed exactly. coalesce(sum, 0): a user
    // whose every value is NULL sums to NULL here but to 0 cents on the
    // stream side (each NULL contributes 0 to the running state).
    "stream_user_stats_parity" ->
      """SELECT user_id, count(*) AS n_events,
                CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0) AS BIGINT) AS cents
         FROM events WHERE user_id IS NOT NULL
         GROUP BY user_id ORDER BY user_id""",

    "q9b_events_sliding" ->
      """WITH e AS (SELECT epoch_us(ts) AS us, event_type, value FROM events),
         w AS (
           SELECT (us // 1800000000) * 1800000000 AS win_start_us, event_type, value FROM e
           UNION ALL
           SELECT (us // 1800000000) * 1800000000 - 1800000000 AS win_start_us, event_type, value FROM e)
         SELECT win_start_us, event_type, count(*) AS cnt,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM w GROUP BY 1, 2 ORDER BY win_start_us, event_type""",

    "q11_props_json" ->
      """SELECT event_type,
                count(json_extract_string(props, '$.k')) AS n_with_k,
                CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
                CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
         FROM events GROUP BY 1 ORDER BY event_type""",

    "q10_sessionize" ->
      """WITH marked AS (
           SELECT user_id, event_id, value, epoch_us(ts) AS us,
                  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                       THEN 1 ELSE 0 END AS is_new
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         numbered AS (
           SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
           FROM marked)
         SELECT user_id, session_idx, count(*) AS n_events,
                min(us) AS start_us, max(us) AS end_us,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
                max(us) - min(us) AS duration_us
         FROM numbered GROUP BY 1, 2 ORDER BY user_id, session_idx""",

    // banding is an execution strategy here too; the oracle is the
    // plain quadratic session×session overlap join
    "q42_interval_overlap" ->
      """WITH marked AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
                  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                       THEN 1 ELSE 0 END AS is_new
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         numbered AS (
           SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
           FROM marked),
         ses AS (
           SELECT user_id, session_idx, min(us) AS start_us,
                  max(us) AS end_us
           FROM numbered GROUP BY 1, 2),
         p AS (
           SELECT a.user_id AS user_a, b.user_id AS user_b,
                  least(a.end_us, b.end_us)
                    - greatest(a.start_us, b.start_us) AS overlap_us
           FROM ses a JOIN ses b
             ON a.user_id < b.user_id
            AND a.start_us <= b.end_us AND b.start_us <= a.end_us)
         SELECT user_a, user_b, count(*) AS n_overlaps,
                CAST(sum(overlap_us) AS BIGINT) AS tot_overlap_us
         FROM p GROUP BY 1, 2
         ORDER BY n_overlaps DESC, tot_overlap_us DESC, user_a, user_b
         LIMIT 100""",

    // banding is an execution strategy; the oracle is the plain bounded
    // non-equi left join
    "q27_range_join_banded" ->
      """SELECT c.user_id, c.event_id, epoch_us(c.ts) AS us,
                count(v.us2) AS n_views,
                CAST(coalesce(sum(CAST(v.value AS DECIMAL(18,2))), 0) AS DOUBLE) AS sum_views
         FROM (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'click') c
         LEFT JOIN (SELECT user_id AS u2, epoch_us(ts) AS us2, value
                    FROM events WHERE event_type = 'view') v
           ON v.u2 = c.user_id
          AND v.us2 >= epoch_us(c.ts) - 3600000000
          AND v.us2 < epoch_us(c.ts)
         GROUP BY 1, 2, 3 ORDER BY user_id, event_id""",

    "text_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         bg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
                  i -> t[i] || ' ' || t[i + 1])) AS bg
                FROM toks WHERE len(t) >= 2),
         occ AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
         s AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                      count(*) AS n_uniq_bigrams, max(c) AS top_occ
               FROM occ GROUP BY 1)
         SELECT doc_id, n_bigrams, n_uniq_bigrams, top_occ,
                CAST(floor((n_bigrams - n_uniq_bigrams) * 10000.0 / n_bigrams) AS BIGINT) AS dup_bp,
                CAST(floor(top_occ * 10000.0 / n_bigrams) AS BIGINT) AS top_bp
         FROM s ORDER BY doc_id""",

    "inverted_index" ->
      """WITH tok AS (SELECT DISTINCT doc_id, term FROM
                        (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                         FROM documents)
                      WHERE term <> ''),
         w AS (SELECT term, doc_id,
                      row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn,
                      count(*) OVER (PARTITION BY term) AS df
               FROM tok)
         SELECT term, CAST(max(df) AS BIGINT) AS df,
                string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
         FROM w WHERE rn <= 20 GROUP BY term ORDER BY term""",

    "pack_sequences" ->
      """WITH s AS (SELECT doc_id,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                    FROM documents),
         c AS (SELECT doc_id, n_tokens,
                      CAST(sum(n_tokens) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum
               FROM s)
         SELECT doc_id, n_tokens, cum - n_tokens AS start_off,
                (cum - n_tokens) // 256 AS seq_first,
                (cum - 1) // 256 AS seq_last,
                (cum - 1) // 256 - (cum - n_tokens) // 256 + 1 AS n_seqs
         FROM c ORDER BY doc_id""",

    "events_resample" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS h,
                           CAST(round(value * 100) AS BIGINT) AS cents
                    FROM events),
         hourly AS (SELECT user_id, h, count(*) AS cnt, sum(cents) AS sum_cents
                    FROM e GROUP BY 1, 2),
         span AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM e GROUP BY 1),
         grid AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS h FROM span),
         j AS (SELECT g.user_id, g.h, hourly.cnt, hourly.sum_cents
               FROM grid g LEFT JOIN hourly
                 ON g.user_id = hourly.user_id AND g.h = hourly.h)
         SELECT user_id, h * 3600000000 AS hour_us,
                CAST(coalesce(cnt, 0) AS BIGINT) AS n_events,
                CAST(last_value(sum_cents IGNORE NULLS) OVER (
                     PARTITION BY user_id ORDER BY h
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS filled_cents
         FROM j ORDER BY user_id, hour_us""",

    "events_anomaly" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us,
                           CAST(round(value * 100) AS BIGINT) AS cents
                    FROM events),
         w AS (SELECT event_id, user_id, cents,
                      CAST(count(cents) OVER fr AS BIGINT) AS n_prev,
                      CAST(sum(cents) OVER fr AS BIGINT) AS s_prev,
                      CAST(sum(cents * cents) OVER fr AS BIGINT) AS q_prev
               FROM e
               WINDOW fr AS (PARTITION BY user_id ORDER BY us, event_id
                             ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
         SELECT event_id, user_id, cents, n_prev,
                CAST(coalesce(n_prev >= 8 AND
                     (n_prev - 1) * (n_prev * cents - s_prev) * (n_prev * cents - s_prev)
                     > 9 * n_prev * (n_prev * q_prev - s_prev * s_prev),
                     FALSE) AS BIGINT) AS is_anomaly
         FROM w ORDER BY event_id""",

    "table_diff" ->
      """WITH a AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
         b AS (SELECT o_orderkey,
                      CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1000.0
                           ELSE o_totalprice END AS o_totalprice,
                      o_orderstatus
               FROM orders WHERE o_orderkey % 100 <> 0
               UNION ALL
               SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
               FROM orders WHERE o_orderkey % 50 = 0),
         j AS (SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
                      CASE WHEN a.o_orderkey IS NULL THEN 'A'
                           WHEN b.o_orderkey IS NULL THEN 'D'
                           WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
                             OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
                           THEN 'U' END AS change,
                      a.o_totalprice AS old_o_totalprice,
                      b.o_totalprice AS new_o_totalprice,
                      a.o_orderstatus AS old_o_orderstatus,
                      b.o_orderstatus AS new_o_orderstatus
               FROM a FULL JOIN b ON a.o_orderkey = b.o_orderkey)
         SELECT o_orderkey, change, old_o_totalprice, new_o_totalprice,
                old_o_orderstatus, new_o_orderstatus
         FROM j WHERE change IS NOT NULL ORDER BY o_orderkey""",

    "text_top_terms" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS term
           FROM documents),
         tf AS (
           SELECT doc_id, term, count(*) AS tf FROM tok
           WHERE term <> '' AND term NOT IN ('the','a','of','and','to','in')
           GROUP BY 1, 2),
         r AS (
           SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                       ORDER BY tf DESC, term ASC) AS BIGINT) AS rnk
           FROM tf)
         SELECT doc_id, rnk, term, tf FROM r WHERE rnk <= 3
         ORDER BY doc_id, rnk""",

    // text_lm_familiarity: trigram occurrences via generate_series;
    // counts joined back occurrence-weighted; integer division.
    "text_lm_familiarity" ->
      """WITH tri AS (
           SELECT doc_id, substr(text, i, 3) AS tri
           FROM documents,
           LATERAL (SELECT unnest(generate_series(1, len(text) - 2)) AS i) g
           WHERE len(text) >= 3),
         c AS (SELECT tri, count(*) AS n FROM tri GROUP BY 1)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri,
                CAST(sum(n) AS BIGINT) AS fam_sum,
                CAST(sum(n) // count(*) AS BIGINT) AS fam_avg
         FROM tri JOIN c USING (tri)
         GROUP BY doc_id ORDER BY doc_id""",

    // text_heavy_hitters: the MG+rescore result is provably the exact
    // top-20 (in-plan assertion), so the oracle is the plain exact count.
    "text_heavy_hitters" ->
      """WITH tok AS (
           SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
         SELECT tok, count(*) AS n_tok FROM tok WHERE tok <> ''
         GROUP BY 1 ORDER BY n_tok DESC, tok ASC LIMIT 20""",

    // search_bm25: same basis-point integer formula, same div order;
    // dl counts non-empty tokens; sums cast back to BIGINT (DuckDB sums
    // to HUGEINT).
    // search_prf_expand: the whole feedback loop unrolled — base
    // ranking, mined expansion (pre-sorted-subquery string_agg, the
    // q41-hardened discipline), term-table rescore, final top-10
    "search_prf_expand" -> {
      val terms = Bm25QueryTerms.map(t => s"'$t'").mkString(", ")
      val excl = (Bm25QueryTerms ++ graft.ops.TextAnalysis.StopWords)
        .map(t => s"'$t'").mkString(", ")
      def scoreCte(tfN: String, dfN: String): String =
        s"""SELECT t.doc_id,
           |       CAST(sum(
           |         (((10000 * st.n_docs) // d.df) * t.tf * (12000 + 10000))
           |         // (t.tf * 10000 +
           |            (12000 * (10000 - 7500 + (7500 * dl.dl) // st.avgdl)) // 10000)
           |       ) AS BIGINT) AS score_bp
           |FROM $tfN t JOIN $dfN d USING (term)
           |            JOIN dl USING (doc_id), st
           |GROUP BY 1""".stripMargin
      s"""WITH dl AS (
           SELECT doc_id,
                  len(list_filter(string_split(text, ' '), x -> x <> '')) AS dl
           FROM documents),
         st AS (SELECT count(*) AS n_docs, sum(dl) // count(*) AS avgdl FROM dl),
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents),
         tf0 AS (SELECT doc_id, term, count(*) AS tf FROM tok
                 WHERE term IN ($terms) GROUP BY 1, 2),
         df0 AS (SELECT term, count(*) AS df FROM tf0 GROUP BY 1),
         s0 AS (${scoreCte("tf0", "df0")}),
         base AS (SELECT doc_id FROM s0 ORDER BY score_bp DESC, doc_id LIMIT 3),
         mined AS (SELECT term, count(*) AS tf_fb
                   FROM tok JOIN base USING (doc_id)
                   WHERE term <> '' AND term NOT IN ($excl)
                   GROUP BY 1 ORDER BY tf_fb DESC, term LIMIT 3),
         expcsv AS (SELECT string_agg(term, ',' ORDER BY term)
                      AS expanded_terms FROM mined),
         allt AS (SELECT DISTINCT term FROM (
             SELECT term FROM mined
             UNION ALL SELECT unnest(ARRAY[$terms]) AS term)),
         tf1 AS (SELECT doc_id, term, count(*) AS tf
                 FROM tok JOIN allt USING (term) GROUP BY 1, 2),
         df1 AS (SELECT term, count(*) AS df FROM tf1 GROUP BY 1),
         s1 AS (${scoreCte("tf1", "df1")}),
         top AS (SELECT doc_id,
                        CAST(row_number() OVER (ORDER BY score_bp DESC,
                                                         doc_id)
                             AS BIGINT) AS rnk,
                        score_bp
                 FROM s1 ORDER BY score_bp DESC, doc_id LIMIT 10)
         SELECT top.doc_id, top.rnk, top.score_bp, e.expanded_terms
         FROM top CROSS JOIN expcsv e ORDER BY rnk"""
    },

    "search_bm25" -> {
      val terms = Bm25QueryTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH dl AS (
           SELECT doc_id,
                  len(list_filter(string_split(text, ' '), x -> x <> '')) AS dl
           FROM documents),
         st AS (SELECT count(*) AS n_docs, sum(dl) // count(*) AS avgdl FROM dl),
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
                WHERE term IN ($terms) GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         scored AS (
           SELECT t.doc_id,
                  CAST(sum(
                    (((10000 * st.n_docs) // df.df) * t.tf * (12000 + 10000))
                    // (t.tf * 10000 +
                       (12000 * (10000 - 7500 + (7500 * dl.dl) // st.avgdl)) // 10000)
                  ) AS BIGINT) AS score_bp
           FROM tf t JOIN df USING (term) JOIN dl USING (doc_id), st
           GROUP BY 1)
         SELECT doc_id,
                CAST(row_number() OVER (ORDER BY score_bp DESC, doc_id) AS BIGINT) AS rnk,
                score_bp
         FROM scored ORDER BY score_bp DESC, doc_id LIMIT 10"""
    },

    // corpus_report: quality rules (quality_filter oracle) aggregated
    // per (source, lang) with exact-dup rate off distinct md5 counts.
    "corpus_report" ->
      """WITH s AS (
           SELECT doc_id, source, lang, md5(text) AS fp,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                  CAST(list_sum(list_transform(string_split(text, ' '),
                       t -> length(t))) AS BIGINT) AS sum_tok_len,
                  CAST(len(list_filter(string_split(text, ' '),
                       t -> t IN ('the','a','of','and','to','in'))) AS BIGINT) AS n_stopwords,
                  CAST(floor(len(list_distinct(string_split(text, ' '))) * 10000.0
                       / len(string_split(text, ' '))) AS BIGINT) AS uniq_ratio_bp
           FROM documents),
         q AS (SELECT *, CAST((n_tokens BETWEEN 5 AND 5000)
                  AND (sum_tok_len BETWEEN n_tokens * 3 AND n_tokens * 10)
                  AND n_stopwords >= 2 AND uniq_ratio_bp >= 3000 AS BIGINT) AS keep
               FROM s)
         SELECT source, lang,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                CAST(sum(keep) * 10000 // count(*) AS BIGINT) AS quality_bp,
                CAST((count(*) - count(DISTINCT fp)) * 10000 // count(*) AS BIGINT) AS dup_bp,
                CAST(sum(n_tokens) // count(*) AS BIGINT) AS avg_tokens
         FROM q GROUP BY 1, 2 ORDER BY 1, 2""",

    // search_hybrid: the bm25 CTEs + a one-query cosine top-10, fused by
    // RRF on ranks (10000 // (60 + rank), 0 when absent from a list).
    "search_hybrid" -> {
      val terms = Bm25QueryTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH dl AS (
           SELECT doc_id,
                  len(list_filter(string_split(text, ' '), x -> x <> '')) AS dl
           FROM documents),
         st AS (SELECT count(*) AS n_docs, sum(dl) // count(*) AS avgdl FROM dl),
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
                WHERE term IN ($terms) GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         scored AS (
           SELECT t.doc_id,
                  CAST(sum(
                    (((10000 * st.n_docs) // df.df) * t.tf * (12000 + 10000))
                    // (t.tf * 10000 +
                       (12000 * (10000 - 7500 + (7500 * dl.dl) // st.avgdl)) // 10000)
                  ) AS BIGINT) AS score_bp
           FROM tf t JOIN df USING (term) JOIN dl USING (doc_id), st
           GROUP BY 1),
         lex AS (SELECT doc_id,
                        CAST(row_number() OVER (ORDER BY score_bp DESC, doc_id)
                          AS BIGINT) AS lex_rank
                 FROM scored ORDER BY score_bp DESC, doc_id LIMIT 10),
         base AS (
           SELECT vec_id, embedding::DOUBLE[] AS v,
                  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
           FROM embeddings),
         qv AS (SELECT v, nrm FROM base WHERE vec_id = 0),
         cos AS (SELECT b.vec_id,
                        list_dot_product(b.v, q.v) / (b.nrm * q.nrm) AS cosine
                 FROM base b, qv q WHERE b.vec_id <> 0),
         vec AS (SELECT vec_id AS doc_id,
                        CAST(row_number() OVER (ORDER BY cosine DESC, vec_id)
                          AS BIGINT) AS vec_rank
                 FROM cos ORDER BY cosine DESC, vec_id LIMIT 10)
         SELECT doc_id,
                CAST(coalesce(lex_rank, 0) AS BIGINT) AS lex_rank,
                CAST(coalesce(vec_rank, 0) AS BIGINT) AS vec_rank,
                CAST(coalesce(10000 // (60 + lex_rank), 0)
                     + coalesce(10000 // (60 + vec_rank), 0) AS BIGINT) AS rrf_bp
         FROM lex FULL JOIN vec USING (doc_id)
         ORDER BY rrf_bp DESC, doc_id"""
    },

    // bpe_merge_pairs: adjacent char pairs inside whitespace tokens.
    "bpe_merge_pairs" ->
      """WITH tok AS (
           SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         p AS (
           SELECT substr(tok, i, 2) AS pair
           FROM tok,
           LATERAL (SELECT unnest(generate_series(1, len(tok) - 1)) AS i) g
           WHERE len(tok) >= 2)
         SELECT pair, CAST(count(*) AS BIGINT) AS n
         FROM p GROUP BY 1 ORDER BY n DESC, pair LIMIT 20""",

    "q32_window_ranks" ->
      """SELECT o_orderkey, o_custkey,
                CAST(rank() OVER w AS BIGINT) AS rnk,
                CAST(dense_rank() OVER w AS BIGINT) AS drnk,
                percent_rank() OVER w AS prnk,
                cume_dist() OVER w AS cume
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)
         ORDER BY o_orderkey""",

    "q30_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 200000)
           AND NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",

    // q47_not_in_nulls: identical 3VL semantics expected from DuckDB
    "q47_not_in_nulls" ->
      """WITH nc AS (SELECT CASE WHEN c_custkey % 1000 = 0 THEN NULL
                                 ELSE c_custkey END AS nullable_key
                     FROM customer)
         SELECT
           (SELECT count(*) FROM orders
            WHERE o_custkey NOT IN (SELECT nullable_key FROM nc))
             AS not_in_with_null,
           (SELECT count(*) FROM orders
            WHERE o_custkey NOT IN (SELECT nullable_key FROM nc
                                    WHERE nullable_key IS NOT NULL))
             AS not_in_purged,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM nc c
                              WHERE c.nullable_key = o.o_custkey))
             AS not_exists_cnt""",

    "q31_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
                CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
         ORDER BY gid, l_returnflag ASC NULLS FIRST,
                  l_linestatus ASC NULLS FIRST""",

    "events_funnel" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us
           FROM events WHERE event_type IN ('view','click','purchase')),
         w1 AS (
           SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
             OVER (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS carry_1
           FROM e),
         w2 AS (
           SELECT *, min(CASE WHEN event_type = 'click' AND carry_1 IS NOT NULL
                              AND us > carry_1 THEN us END)
             OVER (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS carry_2
           FROM w1),
         per_user AS (
           SELECT user_id,
                  max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s_0,
                  max(CASE WHEN event_type = 'click' AND carry_1 IS NOT NULL
                           AND us > carry_1 THEN 1 ELSE 0 END) AS s_1,
                  max(CASE WHEN event_type = 'purchase' AND carry_2 IS NOT NULL
                           AND us > carry_2 THEN 1 ELSE 0 END) AS s_2
           FROM w2 GROUP BY 1),
         t AS (SELECT COALESCE(CAST(sum(s_0) AS BIGINT), 0) AS n_0,
                      COALESCE(CAST(sum(s_1) AS BIGINT), 0) AS n_1,
                      COALESCE(CAST(sum(s_2) AS BIGINT), 0) AS n_2
               FROM per_user)
         SELECT * FROM (
           SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage, n_0 AS n_users FROM t
           UNION ALL
           SELECT 2, 'view>click', n_1 FROM t
           UNION ALL
           SELECT 3, 'view>click>purchase', n_2 FROM t)
         ORDER BY stage_idx""",

    // text_source_overlap: the same (source, term) collapse + pair join
    "text_source_overlap" ->
      """WITH v AS (SELECT DISTINCT src, term FROM (
                      SELECT source AS src,
                             unnest(string_split(text, ' ')) AS term
                      FROM documents)
                    WHERE term <> ''),
          sz AS (SELECT src, CAST(count(*) AS BIGINT) AS v FROM v
                 GROUP BY 1),
          i AS (SELECT a.src AS sa, b.src AS sb,
                       CAST(count(*) AS BIGINT) AS inter
                FROM v a JOIN v b
                  ON b.term = a.term AND a.src < b.src
                GROUP BY 1, 2)
         SELECT i.sa, i.sb, za.v AS va, zb.v AS vb, i.inter,
                za.v + zb.v - i.inter AS uni,
                i.inter * 10000 // (za.v + zb.v - i.inter) AS jaccard_bp
         FROM i JOIN sz za ON za.src = i.sa
                JOIN sz zb ON zb.src = i.sb
         ORDER BY i.sa, i.sb""",

    // text_freq_spectrum: same tokenization, powers-of-two range join
    // for the log2 bin (the graph_degree_dist twin)
    "text_freq_spectrum" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term
                      FROM documents),
          tf AS (SELECT term, CAST(count(*) AS BIGINT) AS f
                 FROM tok WHERE term <> '' GROUP BY 1),
          b AS (SELECT tf.term, tf.f, CAST(max(t.i) AS BIGINT) AS bin
                FROM tf JOIN range(0, 40) t(i)
                  ON (CAST(1 AS BIGINT) << CAST(t.i AS INTEGER)) <= tf.f
                GROUP BY 1, 2),
          g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_terms,
                       CAST(sum(f) AS BIGINT) AS n_occurrences
                FROM b GROUP BY 1),
          t2 AS (SELECT CAST(sum(n_terms) AS BIGINT) AS vocab,
                        CAST(sum(n_occurrences) AS BIGINT) AS toks
                 FROM g)
         SELECT bin,
                CAST(1 AS BIGINT) << CAST(bin AS INTEGER) AS lo_f,
                n_terms, n_occurrences,
                n_terms * 1000 // vocab AS terms_share_milli,
                n_occurrences * 1000 // toks AS occ_share_milli
         FROM g CROSS JOIN t2 ORDER BY bin""",

    "text_bigram_df" ->
      """WITH toks AS (
           SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         bg AS (
           SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(t)), i -> t[i] || ' ' || t[i + 1]))) AS bigram
           FROM toks WHERE len(t) >= 2)
         SELECT bigram, count(*) AS df FROM bg GROUP BY 1
         ORDER BY df DESC, bigram ASC LIMIT 20""",

    // lift arithmetic is pure BIGINT (sum() widened back down; // floors
    // = Spark div on the all-positive operands); split-on-space mirrors
    // Texty.tokens including empty tokens
    "text_collocations" ->
      """WITH toks AS (
           SELECT string_split(text, ' ') AS t FROM documents),
         uni AS (
           SELECT u.w, CAST(count(*) AS BIGINT) AS c
           FROM toks, LATERAL (SELECT unnest(t) AS w) u GROUP BY 1),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM uni),
         pr AS (
           SELECT t[i] AS w1, t[i + 1] AS w2
           FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) g
           WHERE len(t) >= 2),
         p AS (
           SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy
           FROM pr GROUP BY 1, 2 HAVING count(*) >= 5)
         SELECT p.w1 || ' ' || p.w2 AS bigram, p.c_xy,
                u1.c AS c1, u2.c AS c2,
                CAST(p.c_xy * n_total * 10000 // (u1.c * u2.c) AS BIGINT)
                  AS lift_bp
         FROM p
         JOIN uni u1 ON p.w1 = u1.w
         JOIN uni u2 ON p.w2 = u2.w
         CROSS JOIN tot
         ORDER BY lift_bp DESC, bigram ASC LIMIT 30""",

    "text_ngram_diversity" ->
      """WITH toks AS (
           SELECT source, string_split(text, ' ') AS t FROM documents),
         uni AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_unigrams,
                  CAST(count(DISTINCT u.g) AS BIGINT) AS d_unigrams
           FROM toks, LATERAL (SELECT unnest(t) AS g) u GROUP BY 1),
         bi AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
                  CAST(count(DISTINCT t[i] || ' ' || t[i + 1]) AS BIGINT)
                    AS d_bigrams
           FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) g
           WHERE len(t) >= 2 GROUP BY 1)
         SELECT u.source, u.n_unigrams, u.d_unigrams,
                CAST(u.d_unigrams * 10000 // u.n_unigrams AS BIGINT)
                  AS distinct1_bp,
                CAST(coalesce(b.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                CAST(coalesce(b.d_bigrams, 0) AS BIGINT) AS d_bigrams,
                CAST(b.d_bigrams * 10000 // b.n_bigrams AS BIGINT)
                  AS distinct2_bp
         FROM uni u LEFT JOIN bi b ON b.source = u.source
         ORDER BY u.source""",

    "text_ngram_diversity_hll" -> ngramDiversityHllOracle,
  )
}
