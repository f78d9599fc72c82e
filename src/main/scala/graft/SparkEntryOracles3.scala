package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Portable, PortableKernels}
import graft.ops.{Dedup, Events, Features, Multimodal, Profiler, Relational, Similarity, Sketches, TextAnalysis}

/** Oracle SQL registrations (part 3 of 3) — mechanical split of the
  * SparkEntry registry (round 12; no behavior change). */
trait SparkEntryOracles3 extends SparkEntryOracles2 {
  private[graft] def oracleChunk3: Map[String, String] = Map(

    "text_tfidf_topk" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS term
           FROM documents),
         tf AS (
           SELECT doc_id, term, count(*) AS tf FROM tok
           WHERE term <> '' GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (
           SELECT tf.doc_id, tf.term, tf.tf, df.df,
                  tf.tf * ((10000 * n.n_docs) // df.df) AS tfidf_bp
           FROM tf JOIN df USING (term) CROSS JOIN n),
         r AS (
           SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                       ORDER BY tfidf_bp DESC, term ASC) AS BIGINT) AS rnk
           FROM scored)
         SELECT doc_id, rnk, term, tf, df, tfidf_bp FROM r WHERE rnk <= 3
         ORDER BY doc_id, rnk""",

    "quality_filter" ->
      """WITH s AS (
           SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                  CAST(list_sum(list_transform(string_split(text, ' '),
                       t -> length(t))) AS BIGINT) AS sum_tok_len,
                  CAST(len(list_filter(string_split(text, ' '),
                       t -> t IN ('the','a','of','and','to','in'))) AS BIGINT) AS n_stopwords,
                  CAST(floor(len(list_distinct(string_split(text, ' '))) * 10000.0
                       / len(string_split(text, ' '))) AS BIGINT) AS uniq_ratio_bp
           FROM documents),
         f AS (
           SELECT *,
                  CAST(n_tokens BETWEEN 5 AND 5000 AS BIGINT) AS r_len,
                  CAST(sum_tok_len BETWEEN n_tokens * 3 AND n_tokens * 10 AS BIGINT) AS r_mean_len,
                  CAST(n_stopwords >= 2 AS BIGINT) AS r_stopwords,
                  CAST(uniq_ratio_bp >= 3000 AS BIGINT) AS r_uniq
           FROM s)
         SELECT *, CAST(r_len + r_mean_len + r_stopwords + r_uniq = 4 AS BIGINT) AS keep
         FROM f ORDER BY doc_id""",

    "cdc_apply" ->
      """WITH all_rows AS (
           SELECT o_orderkey, o_totalprice, 0 AS version, 'I' AS op FROM orders
           UNION ALL
           SELECT o_orderkey, o_totalprice + 1000.0, 1, 'U' FROM orders
           WHERE o_orderkey % 10 = 0
           UNION ALL
           SELECT o_orderkey, 0.0, 2, 'D' FROM orders
           WHERE o_orderkey % 100 = 0),
         ranked AS (
           SELECT *, row_number() OVER (PARTITION BY o_orderkey
                       ORDER BY version DESC, op DESC) AS rn
           FROM all_rows)
         SELECT o_orderkey, o_totalprice FROM ranked
         WHERE rn = 1 AND op <> 'D' ORDER BY o_orderkey""",

    "scd2_build" ->
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
           SELECT user_id, event_id, event_type, us AS valid_from_us,
                  lead(us) OVER (PARTITION BY user_id
                    ORDER BY us, event_id) AS valid_to_us
           FROM runs)
         SELECT user_id, event_id, event_type, valid_from_us, valid_to_us,
                CAST(valid_to_us IS NULL AS BIGINT) AS is_current
         FROM v ORDER BY user_id, valid_from_us, event_id""",

    "text_stats" ->
      """WITH s AS (
           SELECT doc_id,
                  CAST(length(text) AS BIGINT) AS n_chars,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq_tokens,
                  CAST(len(list_filter(string_split(text, ' '),
                       t -> t IN ('the','a','of','and','to','in'))) AS BIGINT) AS n_stopwords
           FROM documents)
         SELECT *,
                CAST(floor(n_uniq_tokens * 10000.0 / n_tokens) AS BIGINT) AS uniq_ratio_bp,
                CAST(floor(n_stopwords * 10000.0 / n_tokens) AS BIGINT) AS stop_ratio_bp,
                CAST(floor(least(n_tokens, 100) * 10000.0 / 200)
                     + floor(floor(n_uniq_tokens * 10000.0 / n_tokens) / 2) AS BIGINT) AS quality_bp
         FROM s ORDER BY doc_id""",

    "lang_id" ->
      """WITH s AS (
           SELECT doc_id,
                  len(list_filter(string_split(text,' '), t -> t IN ('the','and','of','is','to'))) AS score_en,
                  len(list_filter(string_split(text,' '), t -> t IN ('der','die','und','ist','das'))) AS score_de,
                  len(list_filter(string_split(text,' '), t -> t IN ('el','los','es','y','una'))) AS score_es,
                  len(list_filter(string_split(text,' '), t -> t IN ('le','les','et','est','une'))) AS score_fr,
                  regexp_matches(text, '[\x{4e00}-\x{9fff}]') AS has_cjk
           FROM documents)
         SELECT doc_id,
                CASE WHEN has_cjk THEN 'zh'
                     WHEN greatest(score_en, score_de, score_es, score_fr) <= 0 THEN 'und'
                     WHEN score_en = greatest(score_en, score_de, score_es, score_fr) THEN 'en'
                     WHEN score_de = greatest(score_en, score_de, score_es, score_fr) THEN 'de'
                     WHEN score_es = greatest(score_en, score_de, score_es, score_fr) THEN 'es'
                     ELSE 'fr' END AS lang_pred
         FROM s ORDER BY doc_id""",

    // lang_id_eval: the lang_id scorer chain + label join + marginals
    "lang_id_eval" ->
      """WITH s AS (
           SELECT doc_id,
                  len(list_filter(string_split(text,' '), t -> t IN ('the','and','of','is','to'))) AS score_en,
                  len(list_filter(string_split(text,' '), t -> t IN ('der','die','und','ist','das'))) AS score_de,
                  len(list_filter(string_split(text,' '), t -> t IN ('el','los','es','y','una'))) AS score_es,
                  len(list_filter(string_split(text,' '), t -> t IN ('le','les','et','est','une'))) AS score_fr,
                  regexp_matches(text, '[\x{4e00}-\x{9fff}]') AS has_cjk
           FROM documents),
          p AS (SELECT doc_id,
                       CASE WHEN has_cjk THEN 'zh'
                            WHEN greatest(score_en, score_de, score_es, score_fr) <= 0 THEN 'und'
                            WHEN score_en = greatest(score_en, score_de, score_es, score_fr) THEN 'en'
                            WHEN score_de = greatest(score_en, score_de, score_es, score_fr) THEN 'de'
                            WHEN score_es = greatest(score_en, score_de, score_es, score_fr) THEN 'es'
                            ELSE 'fr' END AS lang_pred
                FROM s),
          j AS (SELECT d.lang AS lang_true, p.lang_pred
                FROM documents d JOIN p ON p.doc_id = d.doc_id),
          c AS (SELECT lang_true, lang_pred,
                       CAST(count(*) AS BIGINT) AS n
                FROM j GROUP BY 1, 2),
          rt AS (SELECT lang_true, CAST(sum(n) AS BIGINT) AS n_true
                 FROM c GROUP BY 1),
          ct AS (SELECT lang_pred, CAST(sum(n) AS BIGINT) AS n_pred
                 FROM c GROUP BY 1),
          tt AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                        CAST(sum(CASE WHEN lang_true = lang_pred
                                      THEN 1 ELSE 0 END) AS BIGINT)
                          AS n_correct
                 FROM j)
         SELECT c.lang_true, c.lang_pred, c.n, rt.n_true, ct.n_pred,
                c.n * 10000 // rt.n_true AS recall_bp,
                c.n * 10000 // ct.n_pred AS precision_bp,
                tt.n_correct * 10000 // tt.n_docs AS accuracy_bp
         FROM c JOIN rt USING (lang_true) JOIN ct USING (lang_pred)
              CROSS JOIN tt
         ORDER BY lang_true, lang_pred""",

    // text_readability: same proxy arithmetic, same floor divisions
    "text_readability" ->
      """WITH s AS (
           SELECT doc_id,
                  CAST(len(list_filter(string_split(text, ' '),
                       x -> x <> '')) AS BIGINT) AS n_words,
                  CAST(greatest(len(regexp_extract_all(text, '[.!?]')),
                       1) AS BIGINT) AS n_sentences,
                  CAST(len(regexp_extract_all(text, '[aeiouy]+'))
                       AS BIGINT) AS n_syllables
           FROM documents)
         SELECT doc_id, n_words, n_sentences, n_syllables,
                206835 - (1015 * n_words) // n_sentences
                       - (84600 * n_syllables) // n_words AS fre_milli
         FROM s WHERE n_words > 0 ORDER BY doc_id""",

    "token_counts" ->
      """SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
                CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens
         FROM documents ORDER BY doc_id""",

    // τ=1/2 temperature mixing by exact largest remainder: both engines
    // floor the identical IEEE sqrt double, every later step is BIGINT
    "text_mix_allocation" ->
      """WITH s AS (SELECT source,
                    CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                      AS n_tokens
                  FROM documents GROUP BY 1),
         w AS (SELECT source, n_tokens,
                      CAST(floor(sqrt(n_tokens)) AS BIGINT) AS weight
               FROM s),
         t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS nt,
                      CAST(sum(weight) AS BIGINT) AS wt FROM w),
         b AS (SELECT w.*, nt, wt, nt // 10 AS budget FROM w CROSS JOIN t),
         c AS (SELECT *, budget * weight // wt AS base,
                      (budget * weight) % wt AS rem FROM b),
         r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source ASC)
                           AS rk,
                      CAST(sum(base) OVER () AS BIGINT) AS sb FROM c)
         SELECT source, n_tokens,
                n_tokens * 10000 // nt AS raw_share_bp, weight,
                base + (CASE WHEN rk <= budget - sb THEN 1 ELSE 0 END)
                  AS alloc_tokens,
                (base + (CASE WHEN rk <= budget - sb THEN 1 ELSE 0 END))
                  * 10000 // budget AS share_bp
         FROM r ORDER BY source""",

    // contiguous prefix-sum sharding: the window cum equals the
    // distributed running total exactly
    "text_shard_balance" ->
      """WITH s AS (SELECT doc_id,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                  FROM documents),
         c AS (SELECT *,
                 CAST(sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum,
                 CAST(sum(n_tokens) OVER () AS BIGINT) AS total
               FROM s)
         SELECT shard, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
                CAST(sum(n_tokens) AS BIGINT) * 10000 // max(total) AS share_bp
         FROM (SELECT *, least(7, (cum - n_tokens) * 8 // total) AS shard
               FROM c)
         GROUP BY shard ORDER BY shard""",

    // greedy quality-first curation under a per-source token budget:
    // explicit ROWS frame + unique tie-break so both engines accumulate
    // the prefix sum in the identical order
    "text_budget_select" ->
      """WITH s AS (SELECT doc_id, source,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                    CAST(floor(len(list_distinct(string_split(text, ' ')))
                         * 10000.0 / len(string_split(text, ' ')))
                      AS BIGINT) AS uniq_ratio_bp
                  FROM documents),
         c AS (SELECT *,
                 CAST(sum(n_tokens) OVER (PARTITION BY source
                   ORDER BY uniq_ratio_bp DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_tokens,
                 CAST(sum(n_tokens) OVER (PARTITION BY source) AS BIGINT)
                   // 4 AS src_budget
               FROM s)
         SELECT doc_id, source, n_tokens, uniq_ratio_bp, cum_tokens,
                src_budget,
                CAST(cum_tokens <= src_budget AS BIGINT) AS kept
         FROM c ORDER BY doc_id""",

    "doc_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp_md5,
                list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                    list_transform(string_split_regex(text, ''), c -> CAST(ascii(c) AS BIGINT))),
                  (a, x) -> (a * 31 + x) % 1000000007) AS fp_roll
         FROM documents ORDER BY doc_id""",

    // the salt never changes join semantics: oracle is the plain join
    "q18_skew_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_totalprice > 50000
         GROUP BY 1 ORDER BY n_orders DESC, c_mktsegment ASC""",

    // partition pruning never changes WHAT is read, only how much: the
    // oracle is the plain filtered aggregate over the source table.
    "sink_partitioned_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS cnt,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders WHERE o_orderpriority = '1-URGENT'
         GROUP BY 1 ORDER BY o_orderstatus""",

    "doc_chunk" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
         c AS (SELECT doc_id, i // 30 AS chunk_idx,
                      list_slice(arr, i + 1, i + 40) AS chunk
               FROM tok, LATERAL (SELECT unnest(range(0, len(arr), 30)) AS i) r)
         SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
                CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
                array_to_string(chunk, ' ') AS chunk_text
         FROM c ORDER BY doc_id, chunk_idx""",

    "embed_quantize" ->
      """WITH s AS (
           SELECT vec_id, embedding,
                  CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS scale
           FROM embeddings)
         SELECT vec_id, scale,
                array_to_string(list_transform(embedding, x ->
                  CASE WHEN scale = 0 THEN '0'
                       ELSE CAST(CAST(floor((CAST(x AS DOUBLE) * 127.0) / scale) AS BIGINT) AS VARCHAR)
                  END), ',') AS q_csv
         FROM s ORDER BY vec_id""",

    "dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_dups
         FROM documents GROUP BY 1 ORDER BY keep_id""",

    // exact duplicate vectors: quantize-then-poly-fold fingerprint (the
    // portable two-prime basis), planted duplicate = vec 0 under id+10^7
    "embed_dup_exact" ->
      s"""WITH base AS (SELECT vec_id, embedding FROM embeddings
         |              UNION ALL
         |              SELECT vec_id + 10000000, embedding FROM embeddings
         |              WHERE vec_id = 0),
         |  f AS (SELECT vec_id, ${vecFpSql("embedding")} AS fp FROM base)
         |SELECT min(vec_id) AS keep_id, max(vec_id) AS max_id,
         |       count(*) AS n_dups
         |FROM f GROUP BY fp HAVING count(*) >= 2
         |ORDER BY keep_id""".stripMargin,

    "embed_norm_audit" ->
      """WITH q AS (SELECT vec_id,
                      list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(embedding, x ->
                          CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT))),
                        (a, v) -> a + v * v) AS qn2
                    FROM embeddings)
         SELECT qn2 // 262144 AS band, count(*) AS n_vectors,
                min(qn2) AS min_qnorm2, max(qn2) AS max_qnorm2
         FROM q GROUP BY 1 ORDER BY band""",

    // per-dimension floor-means via the pmod identity (sums go negative;
    // DuckDB // truncates, so raw division would diverge from floor)
    "embed_centroid_drift" ->
      """WITH q AS (SELECT vec_id, d - 1 AS d,
                      CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT) AS q
                    FROM (SELECT vec_id, unnest(embedding) AS x,
                                 generate_subscripts(embedding, 1) AS d
                          FROM embeddings)),
           m AS (SELECT d, vec_id % 2 AS half, sum(q) AS s,
                        CAST(count(*) AS BIGINT) AS n
                 FROM q GROUP BY 1, 2),
           mm AS (SELECT d, half,
                         CAST((s - (((s % n) + n) % n)) // n AS BIGINT) AS m
                  FROM m)
         SELECT d, max(CASE WHEN half = 0 THEN m END) AS mean_even,
                max(CASE WHEN half = 1 THEN m END) AS mean_odd,
                abs(max(CASE WHEN half = 0 THEN m END)
                    - max(CASE WHEN half = 1 THEN m END)) AS drift
         FROM mm GROUP BY d ORDER BY d""",

    // dedup_chunk_substrings: 10-token chunks; first occurrence by
    // (doc_id, pos) wins; documents rebuilt from surviving chunks.
    "dedup_chunk_substrings" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
                       FROM documents),
         occ AS (
           SELECT doc_id, pos,
                  array_to_string(tk[(pos*10+1):(pos*10+10)], ' ') AS chunk
           FROM toks,
           LATERAL (SELECT unnest(generate_series(0,
                      (len(tk) + 9) // 10 - 1)) AS pos) p),
         ranked AS (
           SELECT doc_id, pos, chunk,
                  row_number() OVER (PARTITION BY md5(chunk)
                                     ORDER BY doc_id, pos) AS rn
           FROM occ),
         rebuilt AS (
           SELECT doc_id, count(*) AS n_kept,
                  string_agg(chunk, ' ' ORDER BY pos) AS clean_text
           FROM ranked WHERE rn = 1 GROUP BY doc_id),
         totals AS (SELECT doc_id,
                           CAST((len(tk) + 9) // 10 AS BIGINT) AS n_chunks
                    FROM toks)
         SELECT t.doc_id, t.n_chunks,
                CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
                coalesce(r.clean_text, '') AS clean_text
         FROM totals t LEFT JOIN rebuilt r USING (doc_id)
         ORDER BY t.doc_id""",

    // text_boilerplate: chunks in >= 3 distinct docs removed everywhere
    // (first occurrence included); sub-threshold chunks all survive.
    "text_boilerplate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
                       FROM documents),
         occ AS (
           SELECT doc_id, pos,
                  array_to_string(tk[(pos*10+1):(pos*10+10)], ' ') AS chunk
           FROM toks,
           LATERAL (SELECT unnest(generate_series(0,
                      (len(tk) + 9) // 10 - 1)) AS pos) p),
         hot AS (SELECT md5(chunk) AS fp FROM occ
                 GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3),
         kept AS (SELECT * FROM occ
                  WHERE md5(chunk) NOT IN (SELECT fp FROM hot)),
         rebuilt AS (
           SELECT doc_id, count(*) AS n_kept,
                  string_agg(chunk, ' ' ORDER BY pos) AS clean_text
           FROM kept GROUP BY doc_id),
         totals AS (SELECT doc_id,
                           CAST((len(tk) + 9) // 10 AS BIGINT) AS n_chunks
                    FROM toks)
         SELECT t.doc_id, t.n_chunks,
                CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
                coalesce(r.clean_text, '') AS clean_text
         FROM totals t LEFT JOIN rebuilt r USING (doc_id)
         ORDER BY t.doc_id""",

    // corpus_prep: the composed pipeline — boilerplate CTEs feed the
    // quality rules on clean_text, md5 groups pick min-id reps, reps'
    // trigrams probe the bench split; first failing stage attributed.
    "corpus_prep" ->
      """WITH corpus AS (SELECT doc_id, text, source FROM documents
                         WHERE doc_id % 50 <> 0),
         toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus),
         occ AS (
           SELECT doc_id, pos,
                  array_to_string(tk[(pos*10+1):(pos*10+10)], ' ') AS chunk
           FROM toks,
           LATERAL (SELECT unnest(generate_series(0,
                      (len(tk) + 9) // 10 - 1)) AS pos) p),
         hot AS (SELECT md5(chunk) AS cfp FROM occ
                 GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3),
         keptc AS (SELECT * FROM occ
                   WHERE md5(chunk) NOT IN (SELECT cfp FROM hot)),
         rebuilt AS (SELECT doc_id,
                            string_agg(chunk, ' ' ORDER BY pos) AS clean_text
                     FROM keptc GROUP BY doc_id),
         base AS (SELECT c.doc_id, c.source,
                         coalesce(r.clean_text, '') AS clean_text
                  FROM corpus c LEFT JOIN rebuilt r USING (doc_id)),
         s AS (SELECT doc_id,
                  CAST(len(string_split(clean_text, ' ')) AS BIGINT) AS n_tokens,
                  CAST(list_sum(list_transform(string_split(clean_text, ' '),
                       t -> length(t))) AS BIGINT) AS sum_tok_len,
                  CAST(len(list_filter(string_split(clean_text, ' '),
                       t -> t IN ('the','a','of','and','to','in'))) AS BIGINT) AS n_stopwords,
                  CAST(floor(len(list_distinct(string_split(clean_text, ' '))) * 10000.0
                       / len(string_split(clean_text, ' '))) AS BIGINT) AS uniq_ratio_bp
               FROM base),
         q AS (SELECT doc_id, n_tokens,
                  CAST((n_tokens BETWEEN 5 AND 5000)
                   AND (sum_tok_len BETWEEN n_tokens * 3 AND n_tokens * 10)
                   AND n_stopwords >= 2 AND uniq_ratio_bp >= 3000 AS BIGINT) AS keep
               FROM s),
         wq AS (SELECT b.doc_id, b.source, b.clean_text, q.n_tokens, q.keep,
                       md5(b.clean_text) AS fp
                FROM base b JOIN q USING (doc_id)),
         reps AS (SELECT fp, min(doc_id) AS rep_id FROM wq
                  WHERE keep = 1 GROUP BY fp),
         repdocs AS (SELECT w.doc_id, w.clean_text FROM wq w
                     JOIN reps r ON w.fp = r.fp AND w.doc_id = r.rep_id),
         csh AS (SELECT DISTINCT doc_id,
                        arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS s
                 FROM (SELECT doc_id, string_split(clean_text, ' ') AS arr
                       FROM repdocs) t,
                 LATERAL (SELECT unnest(range(1, len(arr) - 1)) AS i) r
                 WHERE len(arr) >= 3),
         bsh AS (SELECT DISTINCT arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS s
                 FROM (SELECT string_split(text, ' ') AS arr FROM documents
                       WHERE doc_id % 50 = 0) t,
                 LATERAL (SELECT unnest(range(1, len(arr) - 1)) AS i) r
                 WHERE len(arr) >= 3),
         contam AS (SELECT doc_id FROM csh JOIN bsh USING (s)
                    GROUP BY doc_id HAVING count(*) >= 3)
         SELECT w.doc_id, w.source,
                CASE WHEN w.keep = 0 THEN 'quality'
                     WHEN w.doc_id <> r.rep_id THEN 'duplicate'
                     WHEN c.doc_id IS NOT NULL THEN 'contaminated'
                     ELSE 'kept' END AS status,
                CAST(CASE WHEN w.keep = 1 AND w.doc_id = r.rep_id
                           AND c.doc_id IS NULL
                          THEN w.n_tokens ELSE 0 END AS BIGINT) AS n_tokens_kept
         FROM wq w LEFT JOIN reps r ON w.fp = r.fp
                   LEFT JOIN contam c ON w.doc_id = c.doc_id
         ORDER BY w.doc_id""",

    "dedup_ngram_jaccard" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
         sh AS (SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS s
                FROM tok, LATERAL (SELECT unnest(range(1, len(arr) - 1)) AS i) r
                WHERE len(arr) >= 3),
         kept AS (SELECT doc_id, s FROM sh
                  WHERE s IN (SELECT s FROM sh GROUP BY s HAVING count(*) <= 100)),
         n AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY 1),
         com AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
                 FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
         SELECT da, db,
                CAST(floor(c * 10000.0 / (na.n_sh + nb.n_sh - c)) AS BIGINT) AS jaccard_bp
         FROM com JOIN n na ON na.doc_id = da JOIN n nb ON nb.doc_id = db
         WHERE CAST(floor(c * 10000.0 / (na.n_sh + nb.n_sh - c)) AS BIGINT) >= 5000
         ORDER BY da, db""",

    // directed containment: same shingle CTEs as the jaccard oracle,
    // both directions unioned from the one undirected co-occurrence
    "dedup_containment" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
         sh AS (SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS s
                FROM tok, LATERAL (SELECT unnest(range(1, len(arr) - 1)) AS i) r
                WHERE len(arr) >= 3),
         kept AS (SELECT doc_id, s FROM sh
                  WHERE s IN (SELECT s FROM sh GROUP BY s HAVING count(*) <= 100)),
         n AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY 1),
         com AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
                 FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
         dirs AS (
           SELECT da AS inner_id, db AS outer_id,
                  CAST(floor(c * 10000.0 / na.n_sh) AS BIGINT) AS contain_bp
           FROM com JOIN n na ON na.doc_id = da
           UNION ALL
           SELECT db, da, CAST(floor(c * 10000.0 / nb.n_sh) AS BIGINT)
           FROM com JOIN n nb ON nb.doc_id = db)
         SELECT inner_id, outer_id, contain_bp FROM dirs
         WHERE contain_bp >= 8000
         ORDER BY inner_id, outer_id""",

    // prefix filtering is LOSSLESS, so its oracle is plain UNCAPPED
    // directed containment — no df-cap `kept` CTE, unlike dedup_containment
    "dedup_containment_prefix" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
         sh AS (SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS s
                FROM tok, LATERAL (SELECT unnest(range(1, len(arr) - 1)) AS i) r
                WHERE len(arr) >= 3),
         n AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         com AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
                 FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
         dirs AS (
           SELECT da AS inner_id, db AS outer_id,
                  CAST(floor(c * 10000.0 / na.n_sh) AS BIGINT) AS contain_bp
           FROM com JOIN n na ON na.doc_id = da
           UNION ALL
           SELECT db, da, CAST(floor(c * 10000.0 / nb.n_sh) AS BIGINT)
           FROM com JOIN n nb ON nb.doc_id = db)
         SELECT inner_id, outer_id, contain_bp FROM dirs
         WHERE contain_bp >= 8000
         ORDER BY inner_id, outer_id""",

    // prefix filtering is LOSSLESS, so its oracle is plain UNCAPPED
    // exact Jaccard — no df-cap `kept` CTE, unlike dedup_ngram_jaccard
    "dedup_jaccard_prefix" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
         sh AS (SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS s
                FROM tok, LATERAL (SELECT unnest(range(1, len(arr) - 1)) AS i) r
                WHERE len(arr) >= 3),
         n AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         com AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
                 FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
         SELECT da, db,
                CAST(floor(c * 10000.0 / (na.n_sh + nb.n_sh - c)) AS BIGINT) AS jaccard_bp
         FROM com JOIN n na ON na.doc_id = da JOIN n nb ON nb.doc_id = db
         WHERE CAST(floor(c * 10000.0 / (na.n_sh + nb.n_sh - c)) AS BIGINT) >= 5000
         ORDER BY da, db""",

    "dedup_clusters" ->
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
           SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src)
         SELECT a AS doc_id, min(b) AS cluster_id
         FROM reach GROUP BY 1 ORDER BY doc_id""",

    // identical constructed JSON, DuckDB's json extraction as the
    // second parser — the variant path must agree field-for-field
    "q38_variant_json" ->
      """WITH j AS (
           SELECT '{"u":{"id":' || CAST(user_id AS VARCHAR) ||
                  ',"m":[' || CAST(event_id % 7 AS VARCHAR) || ',' ||
                  CAST(event_id % 11 AS VARCHAR) || ']},"t":"' ||
                  event_type || '"}' AS v
           FROM events)
         SELECT v->>'$.t' AS t, count(*) AS n,
                CAST(sum(CAST(v->>'$.u.id' AS BIGINT)) AS BIGINT) AS sum_uid,
                CAST(sum(CAST(v->>'$.u.m[1]' AS BIGINT)) AS BIGINT) AS sum_m1
         FROM j GROUP BY 1 ORDER BY t""",

    "q39_lateral_topk" ->
      """SELECT c.c_custkey, o.o_orderkey, o.cents
         FROM customer c
         JOIN LATERAL (
           SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders WHERE o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o ON true
         WHERE c.c_custkey % 50 = 0
         ORDER BY c.c_custkey, o.o_orderkey""",

    "q40_unpivot" ->
      """SELECT name, count(*) AS n,
                CAST(sum(cents) AS BIGINT) AS total_cents
         FROM (
           SELECT * FROM (
             SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS extendedprice,
                    CAST(round(l_quantity * 100) AS BIGINT) AS quantity,
                    CAST(round(l_tax * 100) AS BIGINT) AS tax
             FROM lineitem)
           UNPIVOT (cents FOR name IN (extendedprice, quantity, tax)))
         GROUP BY name ORDER BY name""",

    // version-portable twin (round-6 driver hash-FAIL fix): the driver's
    // DuckDB diverged from local on string_agg(DISTINCT .. ORDER BY) and
    // median() over BIGINT (cont-vs-disc interpolation), so the oracle
    // avoids both — distinct-then-ordered-agg via a pre-deduped subquery,
    // and the x2-median by explicit dyadic rank selection (odd n: twice
    // the middle row; even n: sum of the two middle rows), which is pure
    // integer arithmetic in any engine.
    "q41_modern_aggs" ->
      """WITH c AS (
           SELECT o_orderstatus, o_orderpriority,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
         p AS (
           SELECT o_orderstatus,
                  string_agg(o_orderpriority, ',' ORDER BY o_orderpriority) AS prios
           FROM (SELECT DISTINCT o_orderstatus, o_orderpriority FROM c)
           GROUP BY 1),
         r AS (
           SELECT o_orderstatus, cents,
                  row_number() OVER (PARTITION BY o_orderstatus ORDER BY cents) AS rn,
                  count(*) OVER (PARTITION BY o_orderstatus) AS n
           FROM c),
         m AS (
           SELECT o_orderstatus,
                  CAST(sum(CASE WHEN n % 2 = 1 AND rn * 2 = n + 1 THEN 2 * cents
                                WHEN n % 2 = 0 AND (rn * 2 = n OR rn * 2 = n + 2) THEN cents
                                ELSE 0 END) AS BIGINT) AS med2_cents
           FROM r GROUP BY 1),
         b AS (
           SELECT o_orderstatus,
                  CAST(sum(CASE WHEN cents > 10000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
           FROM c GROUP BY 1)
         SELECT p.o_orderstatus, p.prios, m.med2_cents, b.n_big
         FROM p JOIN m USING (o_orderstatus) JOIN b USING (o_orderstatus)
         ORDER BY 1""",

    // regex syntax restricted to the Java-regex ∩ RE2 common subset
    // (char classes + bounded repeats) so both engines match identically
    "text_redact" ->
      """WITH s AS (
           SELECT doc_id,
                  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ||
                  CASE WHEN doc_id % 3 = 0
                       THEN ' tel ' || printf('555-%03d-%04d', doc_id % 1000, doc_id % 10000)
                       ELSE '' END AS text
           FROM documents)
         SELECT doc_id,
                CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
                CAST(len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
                regexp_replace(
                  regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                  '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
         FROM s ORDER BY doc_id""",

    // privacy_k_anon / privacy_k_report: the k-anonymity audit re-derived
    // as one GROUP BY over the same QI projection; all outputs are counts
    // and integer bp (// floors, both sides non-negative).
    "privacy_k_anon" ->
      """WITH g AS (
           SELECT c_nationkey, c_mktsegment,
                  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_kb,
                  CAST(count(*) AS BIGINT) AS group_n,
                  CAST(count(DISTINCT c_name) AS BIGINT) AS l_distinct
           FROM customer GROUP BY 1, 2, 3)
         SELECT c_nationkey, c_mktsegment, bal_kb, group_n, l_distinct,
                group_n < 5 AS k_violation,
                l_distinct < 2 AS l_violation
         FROM g WHERE group_n < 5 OR l_distinct < 2
         ORDER BY c_nationkey, c_mktsegment, bal_kb""",

    "privacy_k_report" ->
      """WITH g AS (
           SELECT c_nationkey, c_mktsegment,
                  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_kb,
                  count(*) AS group_n,
                  count(DISTINCT c_name) AS l_distinct
           FROM customer GROUP BY 1, 2, 3)
         SELECT CAST(sum(group_n) AS BIGINT) AS n_rows,
                CAST(count(*) AS BIGINT) AS n_groups,
                CAST(COALESCE(sum(group_n) FILTER (WHERE group_n < 5), 0)
                     AS BIGINT) AS rows_k_violating,
                CAST(COALESCE(sum(group_n) FILTER (WHERE l_distinct < 2), 0)
                     AS BIGINT) AS rows_l_violating,
                CAST(min(group_n) AS BIGINT) AS min_k,
                CAST(min(l_distinct) AS BIGINT) AS min_l,
                CAST(COALESCE(sum(group_n) FILTER (WHERE group_n < 5), 0)
                     * 10000 // sum(group_n) AS BIGINT) AS suppress_bp
         FROM g""",

    "privacy_suppress" ->
      """WITH aug AS (
           SELECT *, CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_kb
           FROM customer),
         g AS (
           SELECT c_nationkey, c_mktsegment, bal_kb
           FROM aug
           GROUP BY 1, 2, 3
           HAVING count(*) >= 5 AND count(DISTINCT c_name) >= 2)
         SELECT a.* FROM aug a
         JOIN g ON g.c_nationkey = a.c_nationkey
               AND g.c_mktsegment = a.c_mktsegment
               AND g.bal_kb = a.bal_kb
         ORDER BY a.c_custkey""",

    "privacy_dp_sums" ->
      s"""WITH c AS (
            SELECT c_nationkey,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS v
            FROM customer),
          g AS (
            SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_true,
                   CAST(sum(greatest(least(v, 500000), 0)) AS BIGINT)
                     AS sum_clamped
            FROM c GROUP BY 1),
          z AS (
            SELECT c_nationkey, n_true, sum_clamped,
              (sum_clamped + 250000) // 500000 AS units,
              CAST((bit_count(xor(h1, h1 + 1)) - 1)
                 - (bit_count(xor(h2, h2 + 1)) - 1) AS BIGINT) AS noise_units
            FROM (SELECT *,
                   (CAST(c_nationkey AS BIGINT) % ${Portable.P1}
                      * ${Portable.aCoef(19)} + ${Portable.bCoef(19)})
                     % ${Portable.P1} AS h1,
                   (CAST(c_nationkey AS BIGINT) % ${Portable.P1}
                      * ${Portable.aCoef(20)} + ${Portable.bCoef(20)})
                     % ${Portable.P1} AS h2
                  FROM g))
         SELECT c_nationkey, n_true, sum_clamped, noise_units,
                CAST(greatest((units + noise_units) * 500000, 0) AS BIGINT)
                  AS released,
                CAST(6931 AS BIGINT) AS eps_bp
         FROM z ORDER BY c_nationkey""",

    // privacy_generalization: one block per ladder level, the same
    // floor-bucket arithmetic, argmin level under the budget
    "privacy_generalization" -> {
      val blocks = (0 until 4).map { lv =>
        val width = 1000L * math.pow(10, lv).toLong
        s"""SELECT CAST($lv AS BIGINT) AS level,
           |       CAST(count(*) AS BIGINT) AS n_groups,
           |       CAST(sum(group_n) AS BIGINT) AS n_rows,
           |       CAST(coalesce(sum(CASE WHEN group_n < 5
           |                              THEN group_n END), 0)
           |            AS BIGINT) AS rows_k_violating,
           |       CAST(min(group_n) AS BIGINT) AS min_k,
           |       CAST(min(l_distinct) AS BIGINT) AS min_l
           |FROM (SELECT c_nationkey, c_mktsegment,
           |             CAST(floor(c_acctbal / $width) AS BIGINT) AS b,
           |             count(*) AS group_n,
           |             count(DISTINCT c_name) AS l_distinct
           |      FROM customer GROUP BY 1, 2, 3)""".stripMargin
      }.mkString("(", ")\n UNION ALL (", ")")
      s"""WITH lvls AS ($blocks),
         | lv2 AS (SELECT *, rows_k_violating * 10000 // n_rows
         |                     AS suppress_bp
         |         FROM lvls),
         | ch AS (SELECT CAST(coalesce(min(level), -1) AS BIGINT)
         |                 AS chosen_level
         |        FROM lv2 WHERE suppress_bp <= 500)
         |SELECT level, n_groups, n_rows, rows_k_violating, min_k,
         |       min_l, suppress_bp, ch.chosen_level,
         |       level = ch.chosen_level AS chosen
         |FROM lv2 CROSS JOIN ch ORDER BY level""".stripMargin
    },

    // privacy_t_closeness: full (group × status-domain) grid via the
    // cross join, absent cells coalesce to p=0, TVD in floor bp
    "privacy_t_closeness" ->
      """WITH o AS (SELECT o_orderpriority,
                           CAST(year(o_orderdate) AS BIGINT) AS o_year,
                           o_orderstatus
                    FROM orders),
          cell AS (SELECT o_orderpriority, o_year, o_orderstatus,
                          CAST(count(*) AS BIGINT) AS n_gs
                   FROM o GROUP BY 1, 2, 3),
          grp AS (SELECT o_orderpriority, o_year,
                         CAST(sum(n_gs) AS BIGINT) AS n_group
                  FROM cell GROUP BY 1, 2),
          dom AS (SELECT o_orderstatus,
                         CAST(count(*) AS BIGINT) AS n_s
                  FROM o GROUP BY 1),
          tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM o),
          f AS (SELECT g.o_orderpriority, g.o_year, g.n_group,
                       coalesce(c.n_gs, 0) * 10000 // g.n_group AS p_bp,
                       d.n_s * 10000 // t.n_tot AS q_bp
                FROM grp g CROSS JOIN dom d CROSS JOIN tot t
                LEFT JOIN cell c
                  ON c.o_orderpriority = g.o_orderpriority
                 AND c.o_year = g.o_year
                 AND c.o_orderstatus = d.o_orderstatus)
         SELECT o_orderpriority, o_year,
                CAST(max(n_group) AS BIGINT) AS n_group,
                CAST(sum(abs(p_bp - q_bp)) AS BIGINT) // 2 AS t_bp
         FROM f GROUP BY 1, 2
         ORDER BY t_bp DESC, o_orderpriority, o_year LIMIT 20""",

    // trailing-ones(h) = bit_count((h XOR h+1)) - 1 is the portable
    // Geometric(1/2) draw; the noise is the difference of two draws
    "privacy_dp_counts" ->
      s"""WITH g AS (
            SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_true
            FROM customer GROUP BY 1),
          h AS (
            SELECT c_nationkey, n_true,
              (CAST(c_nationkey AS BIGINT) % ${Portable.P1}
                 * ${Portable.aCoef(17)} + ${Portable.bCoef(17)})
                % ${Portable.P1} AS h1,
              (CAST(c_nationkey AS BIGINT) % ${Portable.P1}
                 * ${Portable.aCoef(18)} + ${Portable.bCoef(18)})
                % ${Portable.P1} AS h2
            FROM g),
          z AS (
            SELECT c_nationkey, n_true,
              CAST((bit_count(xor(h1, h1 + 1)) - 1)
                 - (bit_count(xor(h2, h2 + 1)) - 1) AS BIGINT) AS noise
            FROM h)
         SELECT c_nationkey, n_true, noise,
                CAST(greatest(n_true + noise, 0) AS BIGINT) AS released,
                CAST(6931 AS BIGINT) AS eps_bp
         FROM z ORDER BY c_nationkey""",

    // NOT EXISTS, not NOT IN: a NULL fp in base (null-text doc) would
    // turn NOT IN into UNKNOWN for every row, while Spark's left_anti
    // (null join keys never match) keeps them.
    "dedup_incremental" ->
      """WITH base AS (
           SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 2 = 0),
         inc AS (
           SELECT md5(text) AS fp, min(doc_id) AS keep_id
           FROM documents WHERE doc_id % 2 = 1 GROUP BY 1)
         SELECT fp, keep_id FROM inc
         WHERE NOT EXISTS (SELECT 1 FROM base WHERE base.fp = inc.fp)
         ORDER BY keep_id""",

    "fp_hash_split" -> {
      import Portable.{P1, aCoef, bCoef}
      s"""SELECT o_orderkey,
            CASE WHEN ((o_orderkey % $P1) * ${aCoef(7)} + ${bCoef(7)}) % $P1
                      < ${P1 / 10000L * 2000L}
                 THEN 'test' ELSE 'train' END AS split
         FROM orders ORDER BY o_orderkey"""
    },

    // fp_propensity_weights: the affine membership formula re-derives
    // the sampled counts; weights + round-trip error in floor bp
    "fp_propensity_weights" -> {
      import Portable.{P1, aCoef, bCoef}
      s"""WITH o AS (SELECT o_orderpriority AS stratum,
                            CAST(count(*) AS BIGINT) AS n_orig
                     FROM orders GROUP BY 1),
          sm AS (SELECT o_orderpriority AS stratum,
                        CAST(count(*) AS BIGINT) AS n_samp
                 FROM orders
                 WHERE ((o_orderkey % $P1) * ${aCoef(11)} + ${bCoef(11)})
                       % $P1
                       < CASE o_orderpriority
                           WHEN '1-URGENT' THEN ${P1 / 10000L * 2000L}
                           WHEN '5-LOW' THEN ${P1 / 10000L * 1000L}
                           ELSE ${P1 / 10000L * 500L} END
                 GROUP BY 1),
          j AS (SELECT o.stratum, o.n_orig,
                       COALESCE(sm.n_samp, 0) AS n_samp
                FROM o LEFT JOIN sm ON sm.stratum = o.stratum)
         SELECT stratum AS o_orderpriority, n_orig, n_samp,
                n_orig * 10000 // n_samp AS weight_bp,
                n_samp * (n_orig * 10000 // n_samp) // 10000 AS est_n,
                abs(n_samp * (n_orig * 10000 // n_samp) // 10000
                    - n_orig) * 10000 // n_orig AS err_bp
         FROM j ORDER BY stratum"""
    },

    // fp_isotonic: ntile binning + the same max-min identity as two
    // non-equi joins over the 16-row bin table
    "fp_isotonic" ->
      """WITH base AS (SELECT ntile(16) OVER (ORDER BY o_totalprice,
                                              o_orderkey) AS b,
                              CASE WHEN o_orderstatus = 'F' THEN 1
                                   ELSE 0 END AS y
                       FROM orders),
          bins AS (SELECT b, CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(y) AS BIGINT) AS sum_y
                   FROM base GROUP BY 1),
          pre AS (SELECT b, n, sum_y,
                         CAST(sum(n) OVER (ORDER BY b
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn,
                         CAST(sum(sum_y) OVER (ORDER BY b
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cy
                  FROM bins),
          ivl AS (SELECT l.b AS j, r.b AS kk,
                         CAST(r.cy - l.cy + l.sum_y AS DOUBLE)
                         / CAST(r.cn - l.cn + l.n AS DOUBLE) AS a
                  FROM pre l JOIN pre r ON l.b <= r.b),
          inn AS (SELECT i.b AS i, v.j, min(v.a) AS mn
                  FROM bins i JOIN ivl v
                    ON v.j <= i.b AND i.b <= v.kk
                  GROUP BY 1, 2),
          fit AS (SELECT i, max(mn) AS iso_fit FROM inn GROUP BY 1)
         SELECT bins.b AS bin, bins.n, bins.sum_y,
                CAST(bins.sum_y AS DOUBLE) / CAST(bins.n AS DOUBLE)
                  AS rate,
                fit.iso_fit
         FROM bins JOIN fit ON fit.i = bins.b ORDER BY bin""",

    // fp_kfold: the identical affine fold draw (coefficient index 17),
    // then the k-row balance rollup
    "fp_kfold" -> {
      import Portable.{P1, aCoef, bCoef}
      s"""SELECT fold, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS n_pos,
                 CAST(sum(y) * 10000 // count(*) AS BIGINT) AS pos_bp
         FROM (SELECT ((o_orderkey % $P1) * ${aCoef(17)} + ${bCoef(17)})
                      % $P1 % 5 AS fold,
                      CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
               FROM orders)
         GROUP BY 1 ORDER BY 1"""
    },

    "sim_brute_topk" -> bruteTopKSql,
    // full-probe IVF ≡ brute (spec-pinned): same oracle text
    "sim_ivf_topk_fullprobe" -> bruteTopKSql,
    "sim_mmr_rerank" -> mmrOracle(20, 5, 20),

    "sim_range_search" ->
      """WITH base AS (
           SELECT vec_id, embedding::DOUBLE[] AS v,
                  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
           FROM embeddings)
         SELECT q.vec_id AS q_id, b.vec_id,
                list_dot_product(b.v, q.v) / (b.nrm * q.nrm) AS cosine
         FROM base b JOIN base q ON q.vec_id < 20 AND b.vec_id <> q.vec_id
         WHERE list_dot_product(b.v, q.v) / (b.nrm * q.nrm) >= 0.3
         ORDER BY q_id, b.vec_id""",

    // the planted paraphrase (bench vec 0, dim 1 zeroed, text reversed)
    // is re-derived in SQL; cosines are the element-order double fold
    "decontaminate_semantic" ->
      """WITH plant AS (
           SELECT vec_id + 10000000 AS vec_id,
                  list_concat([CAST(0 AS FLOAT)], embedding[2:]) AS embedding
           FROM embeddings WHERE vec_id = 0),
         corpus AS (
           SELECT vec_id, embedding::DOUBLE[] AS v,
                  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
           FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 <> 0
                 UNION ALL SELECT * FROM plant)),
         bench AS (
           SELECT vec_id AS bench_id, embedding::DOUBLE[] AS v,
                  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
           FROM embeddings WHERE vec_id % 50 = 0),
         sem AS (
           SELECT c.vec_id AS doc_id, b.bench_id,
                  list_dot_product(c.v, b.v) / (c.nrm * b.nrm) AS cosine
           FROM corpus c JOIN bench b ON c.vec_id <> b.bench_id
           WHERE list_dot_product(c.v, b.v) / (c.nrm * b.nrm) >= 0.4),
         ptxt AS (
           SELECT doc_id + 10000000 AS doc_id,
                  array_to_string(list_reverse(string_split(text, ' ')), ' ') AS text
           FROM documents WHERE doc_id = 0),
         ctxt AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0
                  UNION ALL SELECT * FROM ptxt),
         tok AS (SELECT doc_id, string_split(text, ' ') AS arr FROM ctxt),
         sh AS (SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS s
                FROM tok, LATERAL (SELECT unnest(range(1, len(arr) - 1)) AS i) r
                WHERE len(arr) >= 3),
         btok AS (SELECT string_split(text, ' ') AS arr FROM documents
                  WHERE doc_id % 50 = 0),
         bsh AS (SELECT DISTINCT arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS s
                 FROM btok, LATERAL (SELECT unnest(range(1, len(arr) - 1)) AS i) r
                 WHERE len(arr) >= 3),
         shc AS (SELECT doc_id, count(*) AS n_shared_shingles
                 FROM sh JOIN bsh USING (s) GROUP BY 1)
         SELECT m.doc_id, m.bench_id, m.cosine,
                COALESCE(c.n_shared_shingles, CAST(0 AS BIGINT)) AS n_shared_shingles
         FROM sem m LEFT JOIN shc c USING (doc_id)
         ORDER BY doc_id, bench_id""",

    "sim_hard_negatives" ->
      """WITH base AS (
           SELECT vec_id, label, embedding::DOUBLE[] AS v,
                  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
           FROM embeddings),
         scored AS (
           SELECT q.vec_id AS q_id, q.label AS q_label, b.vec_id, b.label,
                  list_dot_product(b.v, q.v) / (b.nrm * q.nrm) AS cosine
           FROM base b JOIN base q ON q.vec_id < 20 AND b.vec_id <> q.vec_id),
         pos AS (
           SELECT q_id, max(cosine) AS pos_cos FROM scored
           WHERE label = q_label GROUP BY 1),
         neg AS (
           SELECT q_id, vec_id, cosine,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY cosine DESC, vec_id ASC) AS rnk
           FROM scored WHERE label <> q_label)
         SELECT n.q_id, n.rnk, n.vec_id, n.cosine, p.pos_cos,
                n.cosine > p.pos_cos AS violates_margin
         FROM neg n LEFT JOIN pos p ON p.q_id = n.q_id
         WHERE n.rnk <= 5 ORDER BY n.q_id, n.rnk""",

    "sim_neardup_cosine" ->
      s"""WITH base AS (
           SELECT vec_id, embedding::DOUBLE[] AS v,
                  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
           FROM embeddings),
         $anchoredPairsCtes
         SELECT va, vb, cosine FROM anchored ORDER BY va, vb""",

    "mm_binary_meta" ->
      """SELECT doc_id, CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
                md5(text) AS fp,
                CAST(64 + CAST(octet_length(text::BLOB) AS BIGINT) % 512 AS INT) AS stub_width,
                CAST(64 + (CAST(octet_length(text::BLOB) AS BIGINT) * 31) % 512 AS INT) AS stub_height
         FROM documents ORDER BY doc_id""",

    "profile_lineitem" ->
      """SELECT * FROM (
           SELECT 'l_quantity' AS "column", count(*) AS n_rows,
                  count(l_quantity) AS n_non_null,
                  count(DISTINCT l_quantity) AS n_distinct,
                  CAST(min(l_quantity) AS DOUBLE) AS min_v,
                  CAST(max(l_quantity) AS DOUBLE) AS max_v,
                  CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_v
           FROM lineitem
           UNION ALL
           SELECT 'l_extendedprice', count(*), count(l_extendedprice),
                  count(DISTINCT l_extendedprice),
                  CAST(min(l_extendedprice) AS DOUBLE),
                  CAST(max(l_extendedprice) AS DOUBLE),
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE)
           FROM lineitem
           UNION ALL
           SELECT 'l_discount', count(*), count(l_discount),
                  count(DISTINCT l_discount),
                  CAST(min(l_discount) AS DOUBLE), CAST(max(l_discount) AS DOUBLE),
                  CAST(sum(CAST(l_discount AS DECIMAL(28,2))) AS DOUBLE)
           FROM lineitem
           UNION ALL
           SELECT 'l_orderkey', count(*), count(l_orderkey),
                  count(DISTINCT l_orderkey),
                  CAST(min(l_orderkey) AS DOUBLE), CAST(max(l_orderkey) AS DOUBLE),
                  CAST(sum(CAST(l_orderkey AS DECIMAL(28,2))) AS DOUBLE)
           FROM lineitem)
         ORDER BY "column"""",

    "csv_gbk_roundtrip" ->
      """SELECT c_mktsegment, CAST(count(*) AS VARCHAR) AS cnt
         FROM customer GROUP BY 1
         ORDER BY count(*) DESC, c_mktsegment ASC""",

    // the synthesized-input trick: the expected per-policy stats are a
    // pure function of the synthesis rule (ids 0..49, every 3rd amount
    // unparseable), so DuckDB recomputes them from range() arithmetic
    "source_malformed_policy" ->
      """WITH g AS (
           SELECT CAST(r.range AS BIGINT) AS id,
                  CAST(r.range * 100 AS BIGINT) AS amount,
                  r.range % 3 = 0 AS bad
           FROM range(50) r)
         SELECT * FROM (
           SELECT 'drop_malformed' AS policy, count(*) AS n_rows,
                  CAST(sum(id) AS BIGINT) AS id_sum,
                  CAST(sum(amount) AS BIGINT) AS amount_sum
           FROM g WHERE NOT bad
           UNION ALL
           SELECT 'permissive_all', count(*), CAST(sum(id) AS BIGINT),
                  CAST(sum(CASE WHEN bad THEN NULL ELSE amount END) AS BIGINT)
           FROM g
           UNION ALL
           SELECT 'permissive_corrupt', count(*), CAST(sum(id) AS BIGINT),
                  CAST(NULL AS BIGINT)
           FROM g WHERE bad
           UNION ALL
           SELECT 'quarantine_clean', count(*), CAST(sum(id) AS BIGINT),
                  CAST(sum(amount) AS BIGINT)
           FROM g WHERE NOT bad
           UNION ALL
           SELECT 'quarantine_raw', count(*), CAST(NULL AS BIGINT),
                  CAST(NULL AS BIGINT)
           FROM g WHERE bad)
         ORDER BY policy""",

    // decode stub is deterministic byte math; the corpus is pure ASCII
    // (byte values == code points), so the full kernel output is
    // SQL-expressible: checksum = sum(b*31+7) = 31*sum(b) + 7*len.
    "mm_decode_stub" ->
      """WITH s AS (
           SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
                  CAST(31 * list_aggregate(list_transform(
                         string_split_regex(text, ''),
                         c -> CAST(ascii(c) AS BIGINT)), 'sum')
                       + 7 * length(text) AS BIGINT) AS checksum
           FROM documents)
         SELECT doc_id, n_bytes,
                CAST(64 + n_bytes % 512 AS INT) AS width,
                CAST(64 + (n_bytes * 31) % 512 AS INT) AS height,
                CAST(1 + checksum % 16 AS INT) AS n_frames,
                checksum
         FROM s ORDER BY doc_id""",

    // the stream-stream interval join equals the batch interval join
    // (inclusive [l_ts - 1h, l_ts] window, same-user pairs)
    "stream_interval_join_parity" ->
      """SELECT a.event_id AS l_event_id, b.event_id AS r_event_id,
                a.user_id, a.value AS l_value, b.value AS r_value
         FROM (SELECT * FROM events
               WHERE event_type = 'click' AND user_id % 4 = 0) a
         JOIN (SELECT * FROM events
               WHERE event_type = 'view' AND user_id % 4 = 0) b
           ON b.user_id = a.user_id
          AND epoch_us(b.ts) >= epoch_us(a.ts) - 3600000000
          AND epoch_us(b.ts) <= epoch_us(a.ts)
         ORDER BY l_event_id, r_event_id""",

    // session_window boundary: two events exactly gap apart do NOT merge
    // (half-open windows) => new-session condition is >=, unlike q10's >
    "stream_session_parity" ->
      """WITH marked AS (
           SELECT user_id, value, epoch_us(ts) AS us, event_id,
                  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                       THEN 1 ELSE 0 END AS is_new
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         numbered AS (
           SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
           FROM marked)
         SELECT user_id, min(us) AS start_us, max(us) AS last_us,
                count(*) AS n_events,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM numbered GROUP BY user_id, sid ORDER BY user_id, start_us""",

    // round-trip through JSONL is lossless: oracle = plain aggregate
    "sink_jsonl_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY 1 ORDER BY lang""",

    // pre-evolution rows carry NULL in the added column
    "sink_schema_evolution" ->
      """SELECT CASE WHEN o_orderkey % 2 = 0 THEN '<pre-evolution>'
                     ELSE o_orderpriority END AS priority,
                count(*) AS cnt,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders GROUP BY 1 ORDER BY priority""",

    // the streaming dedup's kept set is the batch keep-lowest-id rule
    "stream_dedup_parity" ->
      """SELECT min(doc_id) AS doc_id, md5(text) AS fingerprint
         FROM documents GROUP BY md5(text) ORDER BY doc_id""",

    // resize stub: out[i] = bytes[(i*len)//1024] for i in [0,1024); the
    // corpus is ASCII so byte values == code points and the checksum is
    // plain integer SQL
    "mm_resize_stub" ->
      """WITH s AS (
           SELECT doc_id, string_split_regex(text, '') AS arr,
                  CAST(length(text) AS BIGINT) AS len
           FROM documents)
         SELECT doc_id, CAST(32 AS INT) AS width, CAST(32 AS INT) AS height,
                CAST(1024 AS BIGINT) AS out_bytes,
                CAST(CASE WHEN len = 0 THEN 0 ELSE
                  list_aggregate(list_transform(range(0, 1024),
                    i -> CAST(ascii(arr[CAST((i * len) // 1024 AS INT) + 1]) AS BIGINT)),
                    'sum') END AS BIGINT) AS checksum
         FROM s ORDER BY doc_id""",

    // frame sampling: every (frameBytes*stride = 128)-strided 32-byte
    // window that fits; ASCII frames are substrings
    "mm_frame_sample" ->
      """WITH s AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len
                    FROM documents)
         SELECT doc_id, CAST(r.i // 128 AS INT) AS frame_idx,
                substr(text, CAST(r.i AS INT) + 1, 32) AS frame_text
         FROM s, LATERAL (SELECT unnest(range(0, greatest(len - 31, 0), 128)) AS i) r
         ORDER BY doc_id, frame_idx""",

    // integer byte histogram: slot j sums bytes at positions ≡ j (mod 16)
    "mm_feature_hist" ->
      """WITH s AS (
           SELECT doc_id,
                  list_transform(string_split_regex(text, ''),
                    c -> CAST(ascii(c) AS BIGINT)) AS b
           FROM documents)
         SELECT doc_id,
                array_to_string(list_transform(range(0, 16), j ->
                  CAST(coalesce(list_aggregate(list_transform(
                    list_filter(range(0, len(b)), i -> i % 16 = j),
                    i -> b[CAST(i AS INT) + 1]), 'sum'), 0) AS VARCHAR)),
                  ',') AS hist_csv
         FROM s ORDER BY doc_id""",

    // bucketing is layout only: the oracle is the plain join+aggregate
    "q20_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY n_orders DESC, c_mktsegment ASC""",

    "fp_stratified_sample" -> {
      import Portable.{P1, aCoef, bCoef}
      s"""SELECT o_orderkey, o_orderpriority FROM orders
          WHERE ((o_orderkey % $P1) * ${aCoef(11)} + ${bCoef(11)}) % $P1
                < CASE o_orderpriority
                    WHEN '1-URGENT' THEN ${P1 / 10000L * 2000L}
                    WHEN '5-LOW' THEN ${P1 / 10000L * 1000L}
                    ELSE ${P1 / 10000L * 500L} END
          ORDER BY o_orderkey"""
    },

    // per-row LOO encodings recomputed, collapsed over (category, y) —
    // constant within each group by construction, so max() is exact
    "fp_target_encode" ->
      """WITH w AS (SELECT o_orderpriority AS cat,
                           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                             AS y
                    FROM orders),
          st AS (SELECT cat, CAST(sum(y) AS BIGINT) AS sum_y,
                        count(*) AS n_c
                 FROM w GROUP BY 1),
          g AS (SELECT CAST(sum(y) * 10000 // count(*) AS BIGINT)
                         AS prior_bp
                FROM w)
         SELECT w.cat AS o_orderpriority, CAST(w.y AS BIGINT) AS y,
                count(*) AS n_rows, max(g.prior_bp) AS prior_bp,
                max(CAST(((st.sum_y - w.y) * 10000 + 20 * g.prior_bp)
                         // (st.n_c - 1 + 20) AS BIGINT)) AS enc_bp
         FROM w JOIN st ON st.cat = w.cat CROSS JOIN g
         GROUP BY 1, 2 ORDER BY 1, 2""",

    // q44_cohort_ltv: same integer month arithmetic + windowed
    // cumulative over the cohort×age aggregate
    "q44_cohort_ltv" ->
      """WITH o AS (SELECT o_custkey,
                           CAST(year(o_orderdate) * 12
                                + month(o_orderdate) - 1 AS BIGINT) AS m,
                           CAST(round(o_totalprice * 100) AS BIGINT)
                             AS cents
                    FROM orders),
          f AS (SELECT o_custkey, min(m) AS cohort_m FROM o GROUP BY 1),
          sz AS (SELECT cohort_m, CAST(count(*) AS BIGINT)
                          AS cohort_size
                 FROM f GROUP BY 1),
          c AS (SELECT f.cohort_m, o.m - f.cohort_m AS age,
                       CAST(count(*) AS BIGINT) AS n_orders,
                       CAST(sum(o.cents) AS BIGINT) AS rev_cents
                FROM o JOIN f ON f.o_custkey = o.o_custkey
                WHERE o.m - f.cohort_m <= 11
                GROUP BY 1, 2),
          r AS (SELECT c.*, sz.cohort_size,
                       CAST(sum(c.rev_cents) OVER (
                              PARTITION BY c.cohort_m ORDER BY c.age
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
                         AS cum_rev_cents
                FROM c JOIN sz ON sz.cohort_m = c.cohort_m)
         SELECT cohort_m, age, n_orders, rev_cents, cohort_size,
                cum_rev_cents,
                cum_rev_cents // cohort_size AS ltv_cents
         FROM r ORDER BY cohort_m, age""",

    // q48_lead_time: same epoch-day arithmetic; signed floor average
    // via the positive-mod identity (DuckDB // truncates on negatives)
    "q48_lead_time" ->
      """WITH j AS (SELECT o.o_orderpriority,
                           epoch_us(l.l_shipdate) // 86400000000
                           - epoch_us(o.o_orderdate) // 86400000000
                             AS lag
                    FROM lineitem l
                    JOIN orders o ON o.o_orderkey = l.l_orderkey),
          g AS (SELECT o_orderpriority,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(min(lag) AS BIGINT) AS min_days,
                       CAST(max(lag) AS BIGINT) AS max_days,
                       CAST(sum(lag) AS BIGINT) AS sum_days,
                       CAST(sum(CASE WHEN lag < 0 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_negative
                FROM j GROUP BY 1)
         SELECT o_orderpriority, n, min_days, max_days, sum_days,
                n_negative,
                (sum_days * 1000
                 - (((sum_days * 1000 % n) + n) % n)) // n
                  AS avg_days_milli
         FROM g ORDER BY o_orderpriority""",

    // q46_abc_class: the same rank-ordered cumulative shares via one
    // desc window — share boundaries as ×10000 integer products
    "q46_abc_class" ->
      """WITH rev AS (SELECT CAST(l_partkey AS BIGINT) AS item,
                             CAST(sum(CAST(round(l_extendedprice * 100)
                                           AS BIGINT)) AS BIGINT) AS value
                      FROM lineitem GROUP BY 1),
          t AS (SELECT CAST(sum(value) AS BIGINT) AS t FROM rev),
          c AS (SELECT item, value,
                       CAST(sum(value) OVER (ORDER BY value DESC, item ASC
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                FROM rev),
          cl AS (SELECT CASE WHEN cum * 10000 <= t.t * 8000 THEN 'A'
                             WHEN cum * 10000 <= t.t * 9500 THEN 'B'
                             ELSE 'C' END AS cls, value
                 FROM c CROSS JOIN t)
         SELECT cls, CAST(count(*) AS BIGINT) AS n_items,
                CAST(sum(value) AS BIGINT) AS class_cents,
                CAST(sum(value) * 10000 // (SELECT t FROM t) AS BIGINT)
                  AS share_bp
         FROM cl GROUP BY 1 ORDER BY 1""",

    // q45_skyline: textbook NOT-EXISTS dominance over distinct points —
    // quadratic but exact, the independent formulation of the Spark
    // side's sort-based frontier
    "q45_skyline" ->
      """WITH pts AS (SELECT CAST(round(p_retailprice * 100) AS BIGINT)
                               AS cost,
                             CAST(p_size AS BIGINT) AS gain,
                             CAST(count(*) AS BIGINT) AS n_rows
                      FROM part GROUP BY 1, 2)
         SELECT cost, gain, n_rows FROM pts p
         WHERE NOT EXISTS (
           SELECT 1 FROM pts q
           WHERE q.cost <= p.cost AND q.gain >= p.gain
             AND (q.cost < p.cost OR q.gain > p.gain))
         ORDER BY cost""",

    // fp_auc_exact: the LOO chain + distinct-score midranks ×2
    "fp_auc_exact" ->
      """WITH w AS (SELECT o_orderpriority AS cat,
                           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                             AS y
                    FROM orders),
          st AS (SELECT cat, CAST(sum(y) AS BIGINT) AS sum_y,
                        count(*) AS n_c
                 FROM w GROUP BY 1),
          g AS (SELECT CAST(sum(y) * 10000 // count(*) AS BIGINT)
                         AS prior_bp
                FROM w),
          e AS (SELECT CAST(w.y AS BIGINT) AS y,
                       CAST(((st.sum_y - w.y) * 10000 + 20 * g.prior_bp)
                            // (st.n_c - 1 + 20) AS BIGINT) AS s
                FROM w JOIN st ON st.cat = w.cat CROSS JOIN g),
          bs AS (SELECT s, CAST(count(*) AS BIGINT) AS cnt,
                        CAST(sum(y) AS BIGINT) AS cnt_pos
                 FROM e GROUP BY 1),
          r AS (SELECT *, coalesce(sum(cnt) OVER (ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS below
                FROM bs),
          t AS (SELECT CAST(sum(cnt_pos) AS BIGINT) AS n_pos,
                       CAST(sum(cnt - cnt_pos) AS BIGINT) AS n_neg,
                       CAST(sum((2 * below + cnt + 1) * cnt_pos)
                            AS BIGINT) AS r2_pos
                FROM r)
         SELECT n_pos, n_neg,
                r2_pos - n_pos * (n_pos + 1) AS u2,
                (r2_pos - n_pos * (n_pos + 1)) * 10000
                  // (2 * n_pos * n_neg) AS auc_bp
         FROM t""",

    // fp_calibration: per-row LOO encodings re-derived, binned, ECE;
    // the sham scorer's chain unioned below
    "fp_calibration" ->
      """WITH w AS (SELECT o_orderpriority AS cat,
                           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                             AS y
                    FROM orders),
          st AS (SELECT cat, CAST(sum(y) AS BIGINT) AS sum_y,
                        count(*) AS n_c
                 FROM w GROUP BY 1),
          g AS (SELECT CAST(sum(y) * 10000 // count(*) AS BIGINT)
                         AS prior_bp
                FROM w),
          e AS (SELECT CAST(w.y AS BIGINT) AS y,
                       CAST(((st.sum_y - w.y) * 10000 + 20 * g.prior_bp)
                            // (st.n_c - 1 + 20) AS BIGINT) AS p
                FROM w JOIN st ON st.cat = w.cat CROSS JOIN g),
          per AS (SELECT least(99, greatest(0, p * 100 // 10000)) AS bin,
                         CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(p) // count(*) AS BIGINT)
                           AS mean_pred_bp,
                         CAST(sum(y) * 10000 // count(*) AS BIGINT)
                           AS rate_bp
                  FROM e GROUP BY 1),
          per2 AS (SELECT *, abs(mean_pred_bp - rate_bp) AS gap_bp
                   FROM per),
          ece AS (SELECT CAST(sum(n * gap_bp) // sum(n) AS BIGINT)
                           AS ece_bp
                  FROM per2),
          sh AS (SELECT o_orderkey % 100 * 100 + 50 AS p,
                        CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                          AS y
                 FROM orders),
          sper AS (SELECT least(9, greatest(0, p * 10 // 10000)) AS bin,
                          CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(p) // count(*) AS BIGINT)
                            AS mean_pred_bp,
                          CAST(sum(y) * 10000 // count(*) AS BIGINT)
                            AS rate_bp
                   FROM sh GROUP BY 1),
          sper2 AS (SELECT *, abs(mean_pred_bp - rate_bp) AS gap_bp
                    FROM sper),
          sece AS (SELECT CAST(sum(n * gap_bp) // sum(n) AS BIGINT)
                            AS ece_bp
                   FROM sper2)
         SELECT 'loo_encoding' AS scorer, bin, n, mean_pred_bp, rate_bp,
                gap_bp, ece_bp
         FROM per2 CROSS JOIN ece
         UNION ALL
         SELECT 'sham_spread', bin, n, mean_pred_bp, rate_bp, gap_bp,
                ece_bp
         FROM sper2 CROSS JOIN sece
         ORDER BY scorer, bin""",

    "fp_string_index" ->
      """WITH d1 AS (
           SELECT o_orderpriority AS v,
                  CAST(row_number() OVER (ORDER BY count(*) DESC, o_orderpriority ASC) - 1 AS BIGINT) AS idx
           FROM orders WHERE o_orderpriority IS NOT NULL
           GROUP BY o_orderpriority),
         d2 AS (
           SELECT o_orderstatus AS v,
                  CAST(row_number() OVER (ORDER BY count(*) DESC, o_orderstatus ASC) - 1 AS BIGINT) AS idx
           FROM orders WHERE o_orderstatus IS NOT NULL
           GROUP BY o_orderstatus)
         SELECT o_orderkey,
                d1.idx AS o_orderpriority_idx,
                d2.idx AS o_orderstatus_idx
         FROM orders
         LEFT JOIN d1 ON d1.v = o_orderpriority
         LEFT JOIN d2 ON d2.v = o_orderstatus
         ORDER BY o_orderkey""",

    "fp_quantile_bucket" ->
      """SELECT o_orderkey,
                ntile(20) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
         FROM orders ORDER BY o_orderkey""",

    "fp_pipeline_assemble" ->
      """WITH d1 AS (
           SELECT o_orderpriority AS v,
                  CAST(row_number() OVER (ORDER BY count(*) DESC, o_orderpriority ASC) - 1 AS BIGINT) AS idx
           FROM orders WHERE o_orderpriority IS NOT NULL
           GROUP BY o_orderpriority),
         d2 AS (
           SELECT o_orderstatus AS v,
                  CAST(row_number() OVER (ORDER BY count(*) DESC, o_orderstatus ASC) - 1 AS BIGINT) AS idx
           FROM orders WHERE o_orderstatus IS NOT NULL
           GROUP BY o_orderstatus),
         b AS (
           SELECT o_orderkey,
                  ntile(20) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
           FROM orders)
         SELECT o.o_orderkey, CAST(3 AS BIGINT) AS n_features,
                CAST(CAST(d1.idx AS DECIMAL(18,6)) AS VARCHAR) || ',' ||
                CAST(CAST(d2.idx AS DECIMAL(18,6)) AS VARCHAR) || ',' ||
                CAST(CAST(b.bucket AS DECIMAL(18,6)) AS VARCHAR) AS features_csv
         FROM orders o
         LEFT JOIN d1 ON d1.v = o.o_orderpriority
         LEFT JOIN d2 ON d2.v = o.o_orderstatus
         JOIN b ON b.o_orderkey = o.o_orderkey
         ORDER BY o.o_orderkey""",

    "fp_na_fill" ->
      """SELECT c_custkey,
                CASE WHEN c_acctbal < 0 THEN -1.0 ELSE c_acctbal END AS c_acctbal,
                CASE WHEN c_nationkey % 5 = 0 THEN '-1' ELSE c_mktsegment END AS c_mktsegment
         FROM customer ORDER BY c_custkey""",

    "dedup_token_set" ->
      """WITH canon AS (
           SELECT doc_id,
                  md5(array_to_string(list_sort(list_distinct(
                    string_split(text, ' '))), ' ')) AS fp
           FROM documents)
         SELECT fp, min(doc_id) AS keep_id, count(*) AS n_dups
         FROM canon GROUP BY fp ORDER BY keep_id""",

    "dedup_edit_distance" ->
      """WITH d AS (
           SELECT doc_id, lang, n_chars // 16 AS lb,
                  substr(text, 1, 40) AS pfx
           FROM documents),
         hot AS (
           SELECT lang, lb FROM d GROUP BY lang, lb
           HAVING count(*) > 100),
         kept AS (
           SELECT d.* FROM d
           WHERE NOT EXISTS (
             SELECT 1 FROM hot h WHERE h.lang = d.lang AND h.lb = d.lb))
         SELECT a.doc_id AS da, b.doc_id AS db,
                CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS lev
         FROM kept a JOIN kept b
           ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
         WHERE levenshtein(a.pfx, b.pfx) <= 12
         ORDER BY da, db""",

    "events_retention" ->
      """WITH wk AS (
           SELECT DISTINCT date_trunc('week', ts) AS w, user_id
           FROM events WHERE event_type = 'purchase')
         SELECT epoch_us(CAST(a.w AS TIMESTAMP)) AS week_start_us,
                count(*) AS n_active, count(b.user_id) AS n_retained
         FROM wk a LEFT JOIN wk b
           ON b.user_id = a.user_id AND b.w = a.w + INTERVAL 7 DAY
         GROUP BY 1 ORDER BY week_start_us""",

    "events_ffill" ->
      """WITH g AS (
           SELECT event_id, user_id, epoch_us(ts) AS us,
                  CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS gapped
           FROM events)
         SELECT event_id, user_id,
                CAST(round(last_value(gapped IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100)
                  AS BIGINT) AS filled_cents
         FROM g ORDER BY event_id""",

    "q33_window_nav" ->
      """SELECT o_orderkey, o_custkey,
                lead(o_orderkey, 1) OVER w AS next_key,
                CAST(round(first_value(o_totalprice) OVER w * 100) AS BIGINT)
                  AS first_cents,
                nth_value(o_orderkey, 2) OVER w AS second_key,
                CAST(ntile(4) OVER w AS BIGINT) AS quartile
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_orderkey""",

    "embed_hof_stats" ->
      """SELECT vec_id,
                CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
                CAST(list_sum(list_transform(embedding,
                  x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)
                       * CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)))
                  AS BIGINT) AS qnorm2
         FROM embeddings ORDER BY vec_id""",

    // embed_cov_power: the same quantize → explode → per-vector pair
    // products → dims² aggregate → row sums
    "embed_cov_power" ->
      """WITH q AS (SELECT vec_id, d - 1 AS d,
                           CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)
                             AS q
                    FROM (SELECT vec_id, unnest(embedding) AS x,
                                 generate_subscripts(embedding, 1) AS d
                          FROM embeddings)),
          g AS (SELECT a.d, b.d AS d2,
                       CAST(sum(a.q * b.q) AS BIGINT) AS g
                FROM q a JOIN q b ON b.vec_id = a.vec_id
                GROUP BY 1, 2),
          n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)
         SELECT d, CAST(sum(g) AS BIGINT) AS v1_q,
                CAST(sum(CASE WHEN d2 = d THEN g END) AS BIGINT)
                  AS diag_q,
                (SELECT n FROM n) AS n
         FROM g GROUP BY d ORDER BY d""",

    "dpp_partitioned_join" ->
      """SELECT o_orderpriority, count(*) AS cnt,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
         GROUP BY 1 ORDER BY o_orderpriority""",

    "sink_orc_roundtrip" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM lineitem WHERE l_quantity <= 10
         GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""",

    "stream_upsert_parity" ->
      """WITH ranked AS (
           SELECT user_id, epoch_us(ts) AS last_us, event_id AS last_event_id,
                  CAST(round(value * 100) AS BIGINT) AS last_cents,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
           FROM events)
         SELECT user_id, last_us, last_event_id, last_cents
         FROM ranked WHERE rn = 1 ORDER BY user_id""",

    "stream_ingest_gate_parity" -> streamGateOracle(2),
    "stream_embed_gate_parity" -> embedGateOracle(3),

    // ListState top-k: the batch truth is the per-user top-3 window
    "stream_tws_topk_parity" ->
      """WITH ranked AS (
           SELECT user_id, epoch_us(ts) AS last_us, event_id AS last_event_id,
                  CAST(round(value * 100) AS BIGINT) AS last_cents,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rnk
           FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL)
         SELECT user_id, rnk, last_us, last_event_id, last_cents
         FROM ranked WHERE rnk <= 3 ORDER BY user_id, rnk""",

    // identical contract to stream_upsert_parity: two streaming
    // implementations (foreachBatch merge / transformWithState state),
    // one batch truth
    "stream_tws_latest_parity" ->
      """WITH ranked AS (
           SELECT user_id, epoch_us(ts) AS last_us, event_id AS last_event_id,
                  CAST(round(value * 100) AS BIGINT) AS last_cents,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
           FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL)
         SELECT user_id, last_us, last_event_id, last_cents
         FROM ranked WHERE rn = 1 ORDER BY user_id""",

    "q34_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey
         FROM orders o
         WHERE CAST(o_totalprice AS DECIMAL(18,2)) >
               (SELECT avg(CAST(o_totalprice AS DECIMAL(18,2)))
                FROM orders i WHERE i.o_custkey = o.o_custkey)
         ORDER BY o_orderkey""",

    "decontaminate" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
         sh AS (SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS s
                FROM tok, LATERAL (SELECT unnest(range(1, len(arr) - 1)) AS i) r
                WHERE len(arr) >= 3),
         bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
         corpus AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0)
         SELECT doc_id, count(*) AS n_shared
         FROM corpus JOIN bench USING (s)
         GROUP BY doc_id HAVING count(*) >= 3
         ORDER BY doc_id""",

    "decontaminate_matrix" ->
      """WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS arr
                    FROM documents),
         sh AS (SELECT DISTINCT doc_id, source,
                       arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS s
                FROM tok, LATERAL (SELECT unnest(range(1, len(arr) - 1)) AS i) r
                WHERE len(arr) >= 3),
         bench AS (SELECT DISTINCT source AS bench_source, s FROM sh
                   WHERE doc_id % 50 = 0),
         corpus AS (SELECT source AS corpus_source, doc_id, s FROM sh
                    WHERE doc_id % 50 <> 0),
         cell AS (SELECT corpus_source, bench_source, doc_id,
                         count(*) AS n_shared
                  FROM corpus JOIN bench USING (s)
                  GROUP BY 1, 2, 3 HAVING count(*) >= 3)
         SELECT corpus_source, bench_source,
                count(*) AS n_contaminated_docs,
                CAST(sum(n_shared) AS BIGINT) AS n_shared_shingles
         FROM cell GROUP BY 1, 2 ORDER BY corpus_source, bench_source""",

    "pack_efficiency" ->
      """WITH s AS (SELECT doc_id,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                    FROM documents),
         c AS (SELECT doc_id, n_tokens,
                      CAST(sum(n_tokens) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum
               FROM s),
         p AS (SELECT n_tokens,
                      (cum - 1) // 256 - (cum - n_tokens) // 256 + 1 AS n_seqs,
                      (cum - 1) // 256 AS seq_last
               FROM c),
         a AS (SELECT count(*) AS n_docs,
                      CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                      CAST(max(seq_last) + 1 AS BIGINT) AS n_sequences,
                      CAST(sum(CASE WHEN n_seqs > 1 THEN 1 ELSE 0 END)
                           AS BIGINT) AS n_straddlers
               FROM p)
         SELECT n_docs, total_tokens, n_sequences, n_straddlers,
                n_sequences * 256 AS padded_tokens,
                (n_sequences * 256 - total_tokens) * 10000
                  // (n_sequences * 256) AS waste_bp
         FROM a""",

    "fp_source_quota" ->
      """SELECT doc_id, source, CAST(rn AS BIGINT) AS rn FROM (
           SELECT doc_id, source,
                  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
           FROM documents)
         WHERE rn <= 10 ORDER BY doc_id""",

    // fp_oversample: the same floor replication, unnested
    "fp_oversample" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_class
                    FROM documents GROUP BY 1),
          m AS (SELECT max(n_class) AS n_max FROM c),
          r AS (SELECT lang, n_class, n_max // n_class AS rep
                FROM c CROSS JOIN m)
         SELECT d.doc_id, d.lang, r.n_class, r.rep,
                CAST(unnest(range(1, r.rep + 1)) AS BIGINT) AS copy_idx
         FROM documents d JOIN r ON r.lang = d.lang
         ORDER BY d.doc_id, copy_idx""",

    // corpus_curriculum: SQL ntile (the rangeNtileBucket twin), the
    // seeded affine shuffle hash, and a plain global row_number in
    // (stage, shuffle_key, doc_id) order
    "corpus_curriculum" -> {
      import Portable.{P1, aCoef, bCoef}
      s"""WITH s AS (
           SELECT doc_id, source, n_chars,
                  CAST(ntile(4) OVER (ORDER BY n_chars, doc_id)
                       AS BIGINT) AS stage,
                  (CAST(doc_id AS BIGINT) % $P1 * ${aCoef(98)}
                     + ${bCoef(98)}) % $P1 % 100000 AS shuffle_key
           FROM documents)
         SELECT doc_id, source, n_chars, stage, shuffle_key,
                CAST(row_number() OVER (ORDER BY stage, shuffle_key,
                                                 doc_id)
                     AS BIGINT) AS position
         FROM s ORDER BY position"""
    },

    "corpus_temperature_sample" -> {
      import Portable.{P1, aCoef, bCoef}
      s"""WITH i AS (
           SELECT source, count(*) AS n_docs,
                  CAST(floor(sqrt(count(*))) AS BIGINT) AS isq
           FROM documents GROUP BY 1),
         m AS (SELECT min(isq) AS min_isq FROM i),
         r AS (SELECT source, n_docs,
                      least(10000, min_isq * 10000 // isq) AS rate_bp
               FROM i, m)
         SELECT d.source, r.n_docs, r.rate_bp,
                CAST(sum(CASE WHEN ((d.doc_id % $P1) * ${aCoef(97)}
                                    + ${bCoef(97)}) % $P1
                              < ${P1 / 10000L} * r.rate_bp
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         FROM documents d JOIN r USING (source)
         GROUP BY 1, 2, 3 ORDER BY d.source"""
    },

    "dedup_normalized" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, '  ' || upper(text) || '!!' FROM documents),
         canon AS (
           SELECT doc_id,
                  md5(trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fp
           FROM corpus)
         SELECT fp, min(doc_id) AS keep_id, count(*) AS n_dups
         FROM canon GROUP BY fp ORDER BY keep_id""",

    "q35_range_frame" ->
      """WITH g AS (
           SELECT event_id, user_id, epoch_us(ts) AS us,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events)
         SELECT event_id, user_id,
                CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY us
                  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS roll_cents
         FROM g ORDER BY event_id""",
  )
}
