package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Portable, PortableKernels}
import graft.ops.{Dedup, Events, Features, Multimodal, Profiler, Relational, Similarity, Sketches, TextAnalysis}

/** Registered queries (part 2 of 3) — mechanical split of the
  * SparkEntry registry (round 12; no behavior change). */
trait SparkEntryQueries2 extends SparkEntryQueries1 {
  private[graft] def queriesChunk2: Map[String, (SparkSession, String) => DataFrame] = Map(
    // EXT Unicode NFC dedup: composed (U+00E9) and decomposed (e+U+0301)
    // spellings of the same text are different bytes — exact dedup is
    // blind to them until canonical composition. The corpus is ASCII, so
    // deterministic composed/decomposed variants are synthesized per doc
    // (the text_redact trick) and collapsed through the codegen'd
    // NfcNormalize kernel; the oracle rebuilds the same variants with
    // chr() and DuckDB's nfc_normalize — two independent NFC
    // implementations (JDK vs utf8proc) agreeing byte-for-byte.
    "dedup_unicode_nfc" -> ((s, dir) => {
      // composed / decomposed twins as explicit escapes: U+00E9 e-acute
      // vs e + U+0301 combining acute; U+00FC u-umlaut vs u + U+0308
      // combining diaeresis
      val raw = when(col("doc_id") % 4 === 0, lit("caf\u00e9"))
        .when(col("doc_id") % 4 === 1, lit("cafe\u0301"))
        .when(col("doc_id") % 4 === 2, lit("Z\u00fcrich"))
        .otherwise(lit("Zu\u0308rich"))
      t(s, dir, "documents")
        .select(col("doc_id"), raw.as("raw"))
        .withColumn("norm", graft.functions.NfcNormalize(col("raw")))
        .groupBy("norm")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("raw")).as("n_raw_forms"),
          min(col("doc_id")).as("keep_id"))
        .orderBy("norm")
    }),
    // the full ingest ADMISSION verdict per arriving doc (exact vs
    // corpus, exact within batch, MinHash-LSH near-dup vs corpus,
    // near-dup within the batch, new): the decision a training pipeline
    // makes every ingest cycle. Two synthetic batch docs with unique
    // vocabulary are PLANTED so the intra-batch quadrant provably fires
    // on every corpus size (natural odd/odd near-dups aren't guaranteed);
    // the oracle plants the identical rows.
    "dedup_ingest_gate" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val planted = Seq(
        (PlantedNearDupIdA, PlantedNearDupTextA),
        (PlantedNearDupIdB, PlantedNearDupTextB)).toDF("doc_id", "text")
      val all = docs.unionByName(planted)
      Dedup.ingestGate(
        all.filter(col("doc_id") % 2 === 0),
        all.filter(col("doc_id") % 2 === 1))
    }),
    // the gate's PERSISTED form: corpus signatures/caps built ONCE into
    // an on-disk index (the process-shared sigIdx* fixtures — pid-scoped,
    // JVM-exit cleanup like the IVF one), every cycle probes it with
    // batch-sized work — the steady-state 100 TB ingest shape. Caps are
    // corpus-scoped by construction (the one semantic difference from
    // the inline gate), and the oracle rebuilds the same corpus-scoped
    // chain in SQL.
    "dedup_sig_index_probe" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.probeSigIndex(s, sigIdxEven(s, dir),
        docs.filter(col("doc_id") % 2 === 1))
    }),
    // TWO ingest cycles against one index: build on the even half,
    // probe batch 1 (doc_id ≡ 1 mod 4), APPEND its admitted (verdict
    // `new`) docs — batch-sized, no rebuild, caps stay build-pinned —
    // then probe batch 2 (doc_id ≡ 3 mod 4), whose verdicts see cycle-1
    // admissions as corpus. The steady-state 100 TB maintenance loop,
    // oracle-replicated end to end.
    "dedup_sig_index_append" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.probeSigIndex(s, sigIdxAppended(s, dir),
        docs.filter(col("doc_id") % 4 === 3))
    }),
    // the REBUILD phase of the ingest lifecycle — the piece the append
    // query's build-pinned-caps contract defers to ("df/bucket statistics
    // refresh only on periodic rebuilds"): after one probe→append cycle,
    // rebuild the index from the GROWN corpus (even ∪ cycle-1 admits), so
    // hot-shingle dfs and hot buckets re-scope over what the index now
    // holds, then probe batch 2 against BOTH indexes side by side. The
    // verdict_parity column is the cap-drift measurement itself (1 where
    // pinned and refreshed caps agree — at this corpus they all do; a 0
    // would mean an appended doc pushed a shingle/bucket over its cap).
    // Oracle replicates both probe chains: build-pinned (the append
    // oracle's) and corpus2-rescoped.
    "dedup_sig_index_rebuild" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val batch2 = docs.filter(col("doc_id") % 4 === 3)
      val vAppend = Dedup.probeSigIndex(s, sigIdxAppended(s, dir), batch2)
        .select(col("doc_id"), col("verdict").as("verdict_appended"),
          col("match_id").as("match_appended"))
      val vRebuild = Dedup.probeSigIndex(s, sigIdxRebuilt(s, dir), batch2)
        .select(col("doc_id"), col("verdict").as("verdict_rebuilt"),
          col("match_id").as("match_rebuilt"))
      vRebuild.join(vAppend, "doc_id")
        .withColumn("verdict_parity",
          (col("verdict_rebuilt") === col("verdict_appended")).cast("long"))
        .orderBy("doc_id")
    }),
    // the production dedup pipeline END TO END (the 100 TB path that
    // Dedup.levenshteinRescore's doc promises; stages previously only
    // checked separately): MinHash-LSH candidate generation → banded
    // Levenshtein re-score → connected-component resolution → per-doc
    // keep verdict (cluster members keep the canonical min-id; docs in
    // no cluster keep themselves). The oracle composes the same stages:
    // portable-hash MinHash CTEs + levenshtein + one recursive CTE.
    "dedup_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cand = Dedup.minhashLsh(docs)
      val rescored = Dedup.levenshteinRescore(cand, docs)
      val clusters = Dedup.resolveClusters(rescored)
      docs.select("doc_id").join(clusters, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("keep_id"))
        .withColumn("keep", (col("keep_id") === col("doc_id")).cast("long"))
        .orderBy("doc_id")
    }),
    // EXT the PRETRAINING CURATION PIPELINE end to end, as ONE
    // declarative plan with ONE hash oracle: quality gate → exact dedup
    // (md5 canonical) → MinHash-LSH + Levenshtein near-dup clusters
    // (canonicals survive) → token accounting on the survivors (total,
    // packing sequences + waste at budget 256, worst shard share at 8
    // token-balanced shards). The single-row report is what a data
    // curation run publishes per corpus drop; every stage is the
    // already-oracled operator, composed — the integration test OF the
    // library's purpose, driver-checked as one hash.
    "pipeline_pretrain_report" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val q = TextAnalysis.withQualityColumns(docs)
        .filter(col("keep") === 1).select("doc_id", "text", "source")
      val canon = q.groupBy(md5(col("text")).as("fp"))
        .agg(min("doc_id").as("doc_id"))
      // each surviving set feeds ≥3 downstream stages — stage it once
      // (the single-process analog of persisting survivors between
      // pipeline phases, which a 100 TB run does via the snapshot sink)
      val exactKept = q.join(canon.select("doc_id"), "doc_id")
        .localCheckpoint()
      val clusters = Dedup.resolveClusters(
        Dedup.levenshteinRescore(Dedup.minhashLsh(exactKept), exactKept))
      val fdocs = exactKept.join(clusters, Seq("doc_id"), "left")
        .filter(coalesce(col("cluster_id"), col("doc_id")) === col("doc_id"))
        .select("doc_id", "text", "source")
        .localCheckpoint()
      val pack = TextAnalysis.packEfficiency(fdocs, 256)
        .select(col("n_docs").as("n_final"), col("total_tokens"),
          col("n_sequences"), col("waste_bp").as("pack_waste_bp"))
      val shard = TextAnalysis.shardBalance(fdocs, 8)
        .agg(max("share_bp").as("max_shard_share_bp"))
      docs.agg(count(lit(1)).as("n_raw"))
        .crossJoin(broadcast(q.agg(count(lit(1)).as("n_quality"))))
        .crossJoin(broadcast(
          exactKept.agg(count(lit(1)).as("n_exact_kept"))))
        .crossJoin(broadcast(pack))
        .crossJoin(broadcast(shard))
    }),
    // EXT leakage-safe train/test split: near-duplicate CLUSTERS land in
    // one split (a doc and its near-copy must never straddle train/test
    // — the decontamination failure mode hash-splitting raw doc ids
    // can't prevent). Composes the production dedup pipeline's cluster
    // ids with the portable hash split keyed on cluster_id, so split
    // membership is a pure function of content relationships.
    "split_leakage_safe" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val clusters = Dedup.resolveClusters(
        Dedup.levenshteinRescore(Dedup.minhashLsh(docs), docs))
      val withCluster = docs.select("doc_id")
        .join(clusters, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      Features.hashSplit(withCluster, "cluster_id", 2000)
        .select("doc_id", "cluster_id", "split")
        .orderBy("doc_id")
    }),
    // cap observability: the drop-loudly contract as a CHECKED surface —
    // per bounded-candidate stage, how many keys went over the cap and
    // how many (doc, key) rows they carried (exact, portable basis).
    "dedup_cap_stats" -> ((s, dir) => Dedup.capStats(t(s, dir, "documents"))),
    // MinHash candidate recall vs the exact n-gram Jaccard answer at the
    // matched threshold (8 bands × 4 rows ⇒ jaccard ≳ 0.5; exact side
    // filters at 5000 bp) — the dedup twin of ann_recall, fully
    // oracle'd. Both sides derive from ONE shared df-capped shingle
    // scan (Dedup.minhashRecall), not two independent explodes.
    "dedup_recall" -> ((s, dir) => Dedup.minhashRecall(t(s, dir, "documents"))),

    // EXT similarity search over embeddings:
    "sim_brute_topk" -> ((s, dir) => Similarity.bruteTopK(t(s, dir, "embeddings"), 20, 5)),
    // EXT MMR diversity re-rank: λ=0.7 greedy pick of 5 from the top-20
    // candidates per query (relevance minus redundancy vs the picked
    // set) — the RAG context diversifier. Re-rank cost is independent
    // of corpus size (candidates pluggable: brute here, ANN at scale);
    // double cosines fold element-order identically in both engines, so
    // the greedy SELECTION is hash-oracle'd end to end.
    "sim_mmr_rerank" -> ((s, dir) =>
      Similarity.mmrRerank(t(s, dir, "embeddings"))),

    // EXT contrastive-training hard negatives: per-anchor top-5
    // different-label cosine neighbors + hardest-positive margin flags
    // (the triplet-loss active set); same broadcast scan shape as brute
    "sim_hard_negatives" -> ((s, dir) =>
      Similarity.hardNegatives(t(s, dir, "embeddings"), 20, 5)),
    // SAMPLED-ANCHOR exact near-dup gold set (~100 portable-hash anchors
    // × corpus, one broadcast map-side scan): the pair-recall family's
    // scale-safe reference — bruteNearDup's all-pairs scan measured
    // α(10)≈1.9 and stays as the guarded spec-only verifier (anchored ⊆
    // brute, SimilarityEventsSpec)
    "sim_neardup_cosine" -> ((s, dir) =>
      Similarity.anchoredNearDup(t(s, dir, "embeddings"), 0.4)),

    // EXT cosine RANGE search: everything within τ=0.3 of each of 20
    // query vectors — the radius contract near-dup admission and
    // recall-oriented retrieval want (k is wrong there); threshold
    // filters in the scan, no per-query window/rank shuffle at all
    "sim_range_search" -> ((s, dir) =>
      Similarity.rangeSearch(t(s, dir, "embeddings"), 20, 0.3)),
    // EXT SEMANTIC decontamination: corpus vectors within cosine 0.4 of
    // any bench vector (bench = vec_id % 50 == 0, the decontaminate
    // split), joined with the lexical gate's shared-shingle count over
    // the same split. One PARAPHRASE is planted — bench vec 0 with one
    // dimension zeroed (cosine 0.9985) carried by doc 0's text in
    // REVERSED word order (1 shared trigram, under the lexical gate's
    // minShared=3) — the leak class the shingle gate provably misses
    // and this scan exists to catch. Broadcast-bench map-side scan;
    // everything deterministic ⇒ hash-oracle'd end to end.
    "decontaminate_semantic" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val docs = t(s, dir, "documents")
      val bench = emb.filter(col("vec_id") % 50 === 0)
        .select("vec_id", "embedding")
      // planted paraphrase: bench vec 0, dim 1 zeroed, re-ingested under
      // id+10^7 (the embed_dup_exact plant convention)
      val plantEmb = emb.filter(col("vec_id") === 0).select(
        (col("vec_id") + 10000000L).as("vec_id"),
        concat(array(lit(0f)),
          slice(col("embedding"), 2, 1000000)).as("embedding"))
      val corpus = emb.filter(col("vec_id") % 50 =!= 0)
        .select("vec_id", "embedding").unionByName(plantEmb)
      val sem = Similarity.semanticContamination(corpus, bench, 0.4)
      // lexical gate over the same split: plant text = doc 0 reversed
      val plantTxt = docs.filter(col("doc_id") === 0).select(
        (col("doc_id") + 10000000L).as("doc_id"),
        array_join(reverse(split(col("text"), " ")), " ").as("text"))
      val corpusTxt = docs.filter(col("doc_id") % 50 =!= 0)
        .select("doc_id", "text").unionByName(plantTxt)
      val benchTxt = docs.filter(col("doc_id") % 50 === 0)
        .select("doc_id", "text")
      val lex = TextAnalysis.contamination(corpusTxt, benchTxt,
          minShared = 1)
        .withColumnRenamed("n_shared", "n_shared_shingles")
      sem.join(lex, Seq("doc_id"), "left")
        .select(col("doc_id"), col("bench_id"), col("cosine"),
          coalesce(col("n_shared_shingles"), lit(0L))
            .as("n_shared_shingles"))
        .orderBy("doc_id", "bench_id")
    }),
    // auto geometry (corpus count via the cached fixture — no per-run
    // scan, ADVICE r11); at decades where banding can't hold recall at
    // τ=0.4 the call ROUTES to the IVF-bounded candidate path instead
    // of refusing (VERDICT r11 item 1)
    "sim_lsh_neardup" -> ((s, dir) => Similarity.lshNearDup(
      t(s, dir, "embeddings"), 0.4,
      corpusN = tableRows(s, dir, "embeddings"))),
    // EXT multi-probe sign-LSH retrieval: each query also probes the
    // Hamming-1 buckets per band (recall without more bands/state);
    // exact-cosine re-rank. The one ANN family with NO float fit —
    // the full approximate path is hash-oracle'd, no recall floor needed
    "sim_lsh_multiprobe_topk" -> ((s, dir) =>
      Similarity.lshMultiProbeTopK(t(s, dir, "embeddings"))),
    // EXT the LSH family's PERSISTED form (completes the lifecycle
    // matrix: IVF, IVFADC and sign-LSH all have build-once/probe-many
    // indexes): postings hive-partitioned by band with the hot-bucket
    // cap pre-applied at build; ≡ the inline multiprobe by construction
    // (spec-asserted), so the SAME SQL oracle hashes it
    "ann_lsh_index_probe" -> ((s, dir) =>
      Similarity.probeLshIndex(s, lshIdx(s, dir),
        t(s, dir, "embeddings"))),
    // EXT the probe-expansion payoff MEASURED and hash-checked:
    // recall@5 of single- vs Hamming-1 multi-probe against the exact
    // top-5 — all three sides deterministic, so the comparison is an
    // oracle'd number, not a floored estimate. n_multi >= n_single is
    // a theorem (an exact-top-5 pair outranked by at most 4 candidates
    // can never leave a SUPERSET candidate set's top-5) — asserted
    // in-plan anyway, so a probe-expansion regression fails loudly
    "ann_recall_lsh_probes" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val exact = s.read.parquet(bruteRef(s, dir))
      val single = Similarity.lshMultiProbeTopK(emb, 20, 5,
        multiProbe = false).select("q_id", "vec_id")
      val multi = Similarity.lshMultiProbeTopK(emb, 20, 5)
        .select("q_id", "vec_id")
      val ne = exact.agg(count(lit(1)).as("n_exact"))
      val ns = exact.join(single, Seq("q_id", "vec_id"))
        .agg(count(lit(1)).as("n_single"))
      val nm = exact.join(multi, Seq("q_id", "vec_id"))
        .agg(count(lit(1)).as("n_multi"))
      ne.crossJoin(broadcast(ns)).crossJoin(broadcast(nm))
        .select(col("n_exact"), col("n_single"),
          when(assert_true(col("n_multi") >= col("n_single"),
            lit("multi-probe candidates are a superset — captured count " +
              "can never drop below single-probe")).isNull,
            col("n_multi")).as("n_multi"),
          expr("n_single * 10000 div n_exact").as("recall_single_bp"),
          expr("n_multi * 10000 div n_exact").as("recall_multi_bp"))
    }),
    // coarse quantizer fit on the bounded 1000-row sample (the cap BITES
    // at this corpus — half the vectors — so the sampled-training path
    // is the one the recall floor actually measures; at 100 TB k-means
    // over the full corpus is a cost cliff that buys no recall)
    // the ORACLED face of the IVF path: at nProbe = nCentroids probing
    // degenerates to the exhaustive scan (SimilarityEventsSpec asserts
    // ≡ bruteTopK exactly), so the k-means float fits drop OUT of the
    // result and the brute-cosine SQL hashes it — pinning the whole IVF
    // plumbing (list routing, candidate union, re-rank) to a DuckDB
    // hash. The PRUNED config isn't separately registered: ann_recall_ivf
    // runs the identical inline ivfTopK under its 4800 bp floor and
    // ann_index_probe runs the persisted pruned probe, so a third
    // rows-only registration of the same pipeline measured nothing the
    // driver could check
    "sim_ivf_topk_fullprobe" -> ((s, dir) =>
      Similarity.ivfTopK(t(s, dir, "embeddings"), 20, 5,
        nProbe = 16, fitSampleCap = 1000,
        fit = Some(coarseFit16(s, dir)))),
    // EXT persisted ANN index: build the IVF index once (cluster-
    // partitioned lists on disk), then answer the query batch by probing
    // it — the scan reads only the probed partitions (DPP). Integer-
    // Lloyd coarse quantizer ⇒ hash-oracled (promoted round 10);
    // ≡ the inline ivfTopK, spec-asserted.
    "ann_index_probe" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      // build-once fixture (pid-scoped, JVM-exit cleanup): each run of
      // the query measures the PROBE — the steady-state op
      Similarity.probeIvfIndex(s, ivfIdx(s, dir),
        emb.filter(col("vec_id") < 20), 5)
    }),
    // EXT product quantization ANN at the SUBLINEAR configuration:
    // 8-byte codes over 256-word codebooks buy enough ADC resolution
    // that a FIXED 64-row exact re-rank holds recall (PqTune-measured
    // 9300 bp at sf0.1 N=2000 = 3.2% of corpus, 10000 bp at N=500 —
    // vs the coarse 4x16 codebook's 15%-of-corpus auto shortlist).
    // Integer-Lloyd codebooks ⇒ the WHOLE retrieval hash-oracles
    // (promoted round 10; recall unchanged at 9300 bp sf0.1);
    // ≡ bruteTopK at shortlist >= corpus, spec-asserted.
    // codebooks fit on the bounded 1000-row sample; the ADC shortlist
    // is the bounded-state TopKAgg, not a full-N window. Shortlist is
    // LADDERED with corpus size (base rung 64, the oracle's constant;
    // 512 at the second decade — corpus FRACTION still falls 25×)
    "sim_pq_topk" -> ((s, dir) =>
      Similarity.pqTopK(t(s, dir, "embeddings"), 20, 5,
        m = 8, codebookSize = 256,
        shortlist = pqShortlist(tableRows(s, dir, "embeddings")),
        fitSampleCap = 1000, fit = Some(pqFit8x256(s, dir)))),
    // EXT the COMPOSED ANN scale path (IVFADC): IVF lists bound WHICH
    // vectors are candidates (6 of 16 lists probed per query — the codes
    // scan partition-prunes via DPP, PlanShapeSpec-asserted), PQ codes
    // bound the BYTES per candidate (8 vs 256), a fixed 64-row exact
    // re-rank restores ranking. Build-once/probe-many persisted form;
    // integer-Lloyd fits ⇒ hash-oracled end to end (promoted round 10);
    // recall floor stays armed in ann_recall_ivfpq.
    "sim_ivfpq_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val n = tableRows(s, dir, "embeddings")
      // build-once fixture: each run measures the DPP-pruned probe
      Similarity.probeIvfPqIndex(s, ivfPqIdx(s, dir),
        emb.filter(col("vec_id") < 20), 5,
        nProbe = ivfPqNProbe(n), shortlist = ivfPqShortlist(n))
    }),
    // similarity × dedup composition: sign-LSH near-dup pairs resolved to
    // connected components — embedding-level duplicate clusters
    "dedup_embedding_clusters" -> ((s, dir) =>
      Dedup.resolveClusters(
        Similarity.lshNearDup(t(s, dir, "embeddings"), 0.4,
            corpusN = tableRows(s, dir, "embeddings"))
          .select(col("va").as("da"), col("vb").as("db")))),
    // int8 embedding quantization (storage/bandwidth path)
    "embed_quantize" -> ((s, dir) => Similarity.quantizeInt8(t(s, dir, "embeddings"))),

    // EXT exact duplicate-vector dedup (vector-store hygiene): corpus
    // vectors are distinct by construction, so one exact duplicate is
    // PLANTED (vec 0 re-ingested under id+10^7 — the shard-replay
    // failure mode the op exists for) and the one group is the
    // deterministic positive the oracle checks
    "embed_dup_exact" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
      val planted = emb.filter(col("vec_id") === 0)
        .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"))
      Similarity.exactDupVectors(emb.unionByName(planted))
    }),
    // EXT norm-distribution audit: banded integer squared norms — dead
    // vectors / exploded outliers / two-encoder bimodality all surface
    // as band structure; map-only + #bands-row agg
    "embed_norm_audit" -> ((s, dir) =>
      Similarity.normHistogram(t(s, dir, "embeddings"))),
    // EXT per-dimension centroid drift between corpus halves — the
    // distribution-shift audit before mixing corpora / swapping encoder
    // versions; floor-means via the portable pmod identity (sums go
    // negative), dims x 2 aggregate cells
    "embed_centroid_drift" -> ((s, dir) =>
      Similarity.centroidDrift(t(s, dir, "embeddings"))),

    // EXT ANN quality surface: recall of the sign-LSH near-dup pairs vs
    // the exact brute-force answer at the same threshold — the tuning
    // report a vector user reads before trusting band settings. One row
    // of exact integer counts; both sides deterministic, so the whole
    // report is oracle'd (the LSH side reuses the portable-hash CTEs).
    "ann_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      // SAMPLED gold set (the anchored scan, linear at any corpus): LSH
      // recall is measured over pairs with >= 1 anchor endpoint — an
      // unbiased estimate of full-pair recall that stays runnable at
      // 100×, where the old brute all-pairs reference (α(10)≈1.9)
      // could not go. One full-outer join + one aggregate.
      val n = tableRows(s, dir, "embeddings")
      val keepBp = Similarity.anchorKeepBp(n, 100)
      val exact = Similarity.anchoredNearDup(emb, 0.4).select("va", "vb")
      val lsh = Similarity.lshNearDup(emb, 0.4, corpusN = n)
        .select("va", "vb")
        .filter(Similarity.isAnchor(col("va"), keepBp) ||
          Similarity.isAnchor(col("vb"), keepBp))
      exact.withColumn("in_e", lit(1L))
        .join(lsh.withColumn("in_l", lit(1L)), Seq("va", "vb"), "full")
        .agg(
          coalesce(sum("in_e"), lit(0L)).as("n_exact"),
          coalesce(sum("in_l"), lit(0L)).as("n_lsh"),
          coalesce(sum(col("in_e") * col("in_l")), lit(0L)).as("n_captured"))
        .withColumn("recall_bp",
          graft.functions.Texty.ratioBp(col("n_captured"), col("n_exact")))
    }),

    // EXT IVF recall report: recall@k of ivfTopK at its default PARTIAL
    // probe (nProbe 4 of 16 centroids — ~4× less scored work than
    // exhaustive) against bruteTopK on the same queries. The integer-
    // Lloyd coarse quantizer has an exact SQL twin, so the report is
    // hash-oracled (promoted round 10; the float fit kept it rows-only).
    "ann_recall_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      // one full-outer join + one aggregate: the brute scan and the
      // k-means-backed IVF pipeline each run exactly once. Floor 4800:
      // the sampled coarse fit (cap 1000, bites here) measures 5800 bp
      // at sf0.1 vs 6600 full-fit (IvfPqTune) — the band moved with the
      // deliberately-bitten sample, the floor follows ~1000 bp under it
      val exact = s.read.parquet(bruteRef(s, dir))
      val approx = Similarity.ivfTopK(emb, 20, 5, fitSampleCap = 1000,
          fit = Some(coarseFit16(s, dir)))
        .select("q_id", "vec_id")
      annRecallReport(exact, approx, floorBp = Some(4800))
    }),
    // recall@k of the PQ/ADC shortlist path at production settings —
    // completes the per-path ANN quality surface (LSH: ann_recall,
    // IVF: ann_recall_ivf, PQ: here). Hash-oracled (round 10).
    "ann_recall_pq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val exact = s.read.parquet(bruteRef(s, dir))
      // the sublinear config sim_pq_topk runs; floor raised 4600 → 6000
      // now that the hi-res codebook measures 9300 bp at sf0.1 (a
      // regenerated corpus has headroom; a collapse below 60% recall
      // means the codebook-resolution contract broke — fail loudly).
      // Shortlist is LADDERED (sl=512 at the second decade — 8200 bp
      // measured, round-10 retune table): the floor stays armed at
      // every rung instead of throwing at ×100 under a 1×-sized knob
      val approx = Similarity.pqTopK(emb, 20, 5,
          m = 8, codebookSize = 256,
          shortlist = pqShortlist(tableRows(s, dir, "embeddings")),
          fitSampleCap = 1000, fit = Some(pqFit8x256(s, dir)))
        .select("q_id", "vec_id")
      annRecallReport(exact, approx, floorBp = Some(6000))
    }),
    // recall of the COMPOSED IVFADC path at the registered settings
    // (nProbe 6/16 lists = 37.5% of codes scanned, sampled fits, 64-row
    // exact re-rank): the integer-Lloyd fits measure 8100 bp at sf0.1
    // (vs the float fits' 6900) — the PQ stage costs ~nothing on top of
    // its IVF pruning. Hash-oracled (round 10).
    "ann_recall_ivfpq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val n = tableRows(s, dir, "embeddings")
      val exact = s.read.parquet(bruteRef(s, dir))
      val approx = Similarity.ivfPqTopK(emb, 20, 5,
        nProbe = ivfPqNProbe(n), shortlist = ivfPqShortlist(n),
        fitSampleCap = 1000,
        coarseFit = Some(coarseFit16(s, dir)),
        pqFit = Some(pqFit8x256(s, dir)))
        .select("q_id", "vec_id")
      annRecallReport(exact, approx, floorBp = Some(6000))
    }),

    // EXT audited k-means step: quantized-integer Lloyd iteration over
    // the embedding corpus — deterministic seeds, broadcast-centroid
    // assignment, portable floor-mean update, centroid-shift convergence
    // signal. The clustering primitive behind IVF codebooks, with an
    // EXACT oracle (the ml.KMeans float/seed paths stay rows-only).
    "sim_kmeans_step" -> ((s, dir) =>
      Similarity.kmeansStep(t(s, dir, "embeddings"))),

    // EXT IVF-layout balance audit: per-cluster membership share,
    // inertia and radius under the audited integer coarse quantizer —
    // the measurement that decides whether an IVF probe plan survives
    // scale (a hot list turns nProbe=1 into a scan). One broadcast-
    // centroid pass + a k-row agg; exact, hash-oracle'd.
    "sim_kmeans_balance" -> ((s, dir) =>
      Similarity.kmeansAssignStats(t(s, dir, "embeddings"))),
    // EXT cluster-balanced coverage sample: m portable-hash reps per
    // coarse cluster — the eval-subset constructor that covers the
    // embedding SPACE instead of mirroring its density (uniform samples
    // never measure rare modes); k·m rows whatever the corpus size
    "embed_coverage_sample" -> ((s, dir) =>
      Similarity.coverageSample(t(s, dir, "embeddings"))),
    // EXT IVF append-lifecycle audit (the vector-store twin of the
    // dedup sig-index probe→append→monitor→rebuild loop): the odd half
    // appends onto the even half's FROZEN centroids; per list the audit
    // reports growth, out-of-envelope staleness vs the base radius, and
    // the rebuild verdict — exact integers, hash-oracle'd
    "ann_ivf_append_audit" -> ((s, dir) =>
      Similarity.ivfAppendAudit(t(s, dir, "embeddings"))),

    // EXT multimodal binary columns:
    "mm_binary_meta" -> ((s, dir) => Multimodal.binaryMeta(t(s, dir, "documents"))),
    "mm_decode_stub" -> ((s, dir) => Multimodal.decodeMeta(s, t(s, dir, "documents"))),
    // binary-in/binary-out resize kernel, surfaced as scalar dims+checksum
    "mm_resize_stub" -> ((s, dir) => Multimodal.resizeMeta(s, t(s, dir, "documents"))),
    // one-to-many frame sampling; ASCII frames decode losslessly to text
    "mm_frame_sample" -> ((s, dir) => Multimodal.frameSampleText(s, t(s, dir, "documents"))),
    // batched feature-extraction shape with an exact integer kernel
    "mm_feature_hist" -> ((s, dir) => Multimodal.featureHistogram(s, t(s, dir, "documents"))),
    // REAL media decode: deterministic PNGs synthesized ON EXECUTORS
    // (javax.imageio — JDK-only, no external codec), then decoded back
    // through the batched kernel plumbing: TRUE width/height from the
    // decoder + the exact pixel sum. Synthesis params are integer
    // functions of doc_id, so the decoded output has a closed-form
    // DuckDB oracle — a real encode→decode round trip with an exact
    // correctness gate (the stub kernels stay as codec-free shapes).
    "mm_decode_real" -> ((s, dir) => Multimodal.decodeReal(s, t(s, dir, "documents"))),
    // REAL resize: decode → nearest-neighbor resample → re-encode →
    // decode again; the checked pixel sum proves the full chain.
    "mm_resize_real" -> ((s, dir) => Multimodal.resizeReal(s, t(s, dir, "documents"))),
    // REAL frame sampling: 3-5-frame animated GIFs synthesized on
    // executors (ImageIO sequence writer), every 2nd frame decoded back
    // via the frame-indexed reader — TRUE dims + exact pixel sums with
    // a closed-form oracle (solid frames make the palette round-trip
    // exact by construction). The video-pipeline frame-sample shape,
    // one-to-many and driver-free.
    "mm_frames_real" -> ((s, dir) =>
      Multimodal.framesReal(s, t(s, dir, "documents"))),
    // REAL shot-boundary detection: decode EVERY frame of a GIF with a
    // PLANTED +100 luminance scene cut (1 in 4 docs single-scene),
    // reduce to integer mean luminance in the batched reader kernel,
    // flag cuts on the per-doc lag diff — pixels never shuffle, only
    // (doc, frame, mean) rows; the cut structure has a closed-form
    // oracle while Spark must recover it from true decoded pixels.
    "mm_shot_detect" -> ((s, dir) =>
      Multimodal.shotDetect(s, t(s, dir, "documents"))),
    // REAL audio: per-doc PCM16 WAV synthesized on executors
    // (javax.sound.sampled — JDK-only), decoded back through the same
    // batched kernel plumbing: TRUE header rate/frames + the exact sum
    // of decoded samples. Closed-form oracle like mm_decode_real.
    "mm_audio_real" -> ((s, dir) => Multimodal.audioReal(s, t(s, dir, "documents"))),
    // REAL audio loudness profile: energy / peak / duration from decoded
    // PCM — the silence/clipping screen; ramp synthesis keeps the whole
    // decode chain closed-form (see Multimodal.decodeWavStats).
    "mm_audio_stats" -> ((s, dir) => Multimodal.audioStats(s, t(s, dir, "documents"))),
    // REAL voice-activity detection: per-frame energy reduced IN the
    // decode kernel (audio bytes never shuffle), voiced runs segmented
    // by one per-doc lag window; planted bursts (1-in-5 single-burst)
    // give the whole segmentation a closed-form oracle.
    "mm_audio_vad" -> ((s, dir) => Multimodal.audioVad(s, t(s, dir, "documents"))),
    // REAL perceptual hash: both variants of each doc's PNG (variant 1
    // differs by ONE invisible pixel — byte-different, perceptually
    // identical) synthesized + decoded on executors, dHash computed from
    // TRUE pixels (9×8 nearest-neighbor resample, adjacent-pixel
    // comparisons). Closed-form oracle: the whole
    // encode→decode→resample→compare chain is integer arithmetic.
    "mm_dhash_real" -> ((s, dir) => Multimodal.dhashReal(s, t(s, dir, "documents"))),

    // EXT acoustic fingerprinting: frame-energy signature bits from
    // REAL decoded PCM (the dHash idea one modality over) + exact
    // Hamming between planted variants — closed-form oracle, decode
    // volume stays in the scan stage.
    "mm_audio_fingerprint" -> ((s, dir) =>
      Multimodal.audioFingerprint(s, t(s, dir, "documents"))),
    // Multimodal near-dup dedup: Hamming-LSH over the dHash corpus —
    // identical-hash collapse first, 4×16-bit banding (pigeonhole: every
    // pair at dist ≤ 3 keeps one band intact → guaranteed recall), exact
    // xor+bit_count verify. The image twin of dedup_minhash_lsh, with
    // the same bounded-candidate contract — and it catches exactly the
    // pairs that exact byte/md5 dedup provably cannot.
    "mm_phash_neardup" -> ((s, dir) => Multimodal.phashNearDup(s, t(s, dir, "documents"))),

    // hot-band-bucket drop accounting for the image near-dup cap — the
    // image twin of dedup_cap_stats (one row, zeros when nothing hot)
    "mm_phash_cap_stats" -> ((s, dir) => Multimodal.phashCapStats(s, t(s, dir, "documents"))),

    // EXT: exact numeric column profile (count/nulls/distinct/min/max/sum).
    "profile_lineitem" -> ((s, dir) =>
      Profiler.numericProfile(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_orderkey"))),

    // S4 CSV sink smoke (rows-only — filesystem op, SURVEY §7 M1): write
    // the flagship result as single-file GBK CSV, read it back schema-less.
    // NB: the write job runs at DataFrame-construction time (inherent to a
    // round-trip query); one overwrite dir per PROCESS (pid-scoped: no
    // orphan growth per call, no cross-JVM race on a shared path).
    "csv_gbk_roundtrip" -> ((s, dir) => {
      val out = java.nio.file.Paths
        .get(System.getProperty("java.io.tmpdir"),
          s"graft-csv-gbk-roundtrip-${ProcessHandle.current().pid()}")
        .toString
      graft.sources.Csv.writeSingle(
        Relational.groupCountSortDesc(t(s, dir, "customer"), "c_mktsegment"),
        out)
      graft.sources.Csv.readSchemaless(s, out, encoding = "GBK")
        .orderBy(col("cnt").cast("long").desc, col("c_mktsegment"))
    }),

    // EXT malformed-record policy: one synthesized CSV (ids 0..49,
    // every 3rd amount unparseable) read under PERMISSIVE-with-capture,
    // DROPMALFORMED and the quarantine split — per-policy integer stats.
    // The oracle recomputes the expected stats arithmetically from the
    // synthesis rule (same trick as the multimodal kernel surfaces).
    "source_malformed_policy" -> ((s, dir) => {
      import java.nio.file.{Files, Paths}
      val base = Paths.get(System.getProperty("java.io.tmpdir"),
        s"graft-malformed-src-${ProcessHandle.current().pid()}")
      Files.createDirectories(base)
      // the CSV reads below are lazy — JVM-exit cleanup, like the IVF dir
      stagedDirCleanup(base.toString)
      val lines = "id,amount" +: (0 until 50).map(i =>
        if (i % 3 == 0) s"$i,x$i" else s"$i,${i * 100L}")
      Files.write(base.resolve("rows.csv"),
        java.util.Arrays.asList(lines: _*))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("amount",
          org.apache.spark.sql.types.LongType)))
      val perm = graft.sources.Csv.readPermissiveCorrupt(
        s, base.toString, schema)
      val dropped = graft.sources.Csv.readDropMalformed(
        s, base.toString, schema)
      val (clean, raw) = graft.sources.Csv.quarantine(
        s, base.toString, schema)
      val nullLong = lit(null).cast("long")
      def stats(policy: String, df: org.apache.spark.sql.DataFrame,
          idSum: org.apache.spark.sql.Column,
          amountSum: org.apache.spark.sql.Column) =
        df.agg(count(lit(1)).as("n_rows"), idSum.as("id_sum"),
            amountSum.as("amount_sum"))
          .select(lit(policy).as("policy"), col("n_rows"),
            col("id_sum"), col("amount_sum"))
      stats("drop_malformed", dropped, sum(col("id")), sum(col("amount")))
        .union(stats("permissive_all", perm,
          sum(col("id")), sum(col("amount"))))
        .union(stats("permissive_corrupt",
          perm.filter(col("_corrupt_record").isNotNull),
          sum(col("id")), max(nullLong)))
        .union(stats("quarantine_clean", clean,
          sum(col("id")), sum(col("amount"))))
        .union(stats("quarantine_raw", raw, max(nullLong), max(nullLong)))
        .orderBy("policy")
    }),

    // EXT partitioned parquet sink + partition-pruned scan (the layout a
    // 100 TB corpus lives in — graft.sources.Partitioned; PlanShapeSpec
    // asserts the read-back plan prunes on PartitionFilters). Same
    // pid-scoped tmp-dir convention as csv_gbk_roundtrip.
    "sink_partitioned_roundtrip" -> ((s, dir) => {
      val out = java.nio.file.Paths
        .get(System.getProperty("java.io.tmpdir"),
          s"graft-part-sink-${ProcessHandle.current().pid()}")
        .toString
      graft.sources.Partitioned.write(t(s, dir, "orders"), out, "o_orderpriority")
      graft.sources.Partitioned.readPruned(s, out, "o_orderpriority", "1-URGENT")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          Relational.moneySum(col("o_totalprice")).as("revenue"))
        .orderBy("o_orderstatus")
    }),

    // EXT Z-order (Morton) key: the multi-dim clustering key behind
    // sources/ZOrder's layout (which ZOrderSpec measures for file
    // skipping); the key arithmetic itself is bit-reproducible SQL, so
    // this is the oracle-checkable surface of the layout path.
    "zorder_key" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
        graft.sources.ZOrder.mortonKey(
          col("o_custkey") % 1024,
          floor(col("o_totalprice")).cast("long") % 1024, 10).as("z"))
        .orderBy("o_orderkey")),

    // EXT small-files compaction round-trip: fragment orders into 64
    // tiny files, compact to ~8 MB targets (sources/Compaction), read
    // back. Layout-only rewrite — oracle is the plain aggregate.
    "sink_compacted_roundtrip" -> ((s, dir) => {
      val base = java.nio.file.Paths
        .get(System.getProperty("java.io.tmpdir"),
          s"graft-compact-${ProcessHandle.current().pid()}")
        .toString
      t(s, dir, "orders").repartition(64)
        .write.mode("overwrite").parquet(s"$base/frag")
      graft.sources.Compaction.compact(s, s"$base/frag", s"$base/out",
        targetBytes = 8L * 1024 * 1024)
      s.read.parquet(s"$base/out")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          Relational.moneySum(col("o_totalprice")).as("revenue"))
        .orderBy("o_orderpriority")
    }),

    // EXT bucketed co-located join: both sides written bucketed+sorted by
    // the join key into the session warehouse, then joined exchange-free
    // (PlanShapeSpec asserts the plan property; here the RESULT is
    // oracle'd — bucketing is layout, never semantics, so the oracle is
    // the plain join). Same build-time-write convention as the sink
    // round-trip queries.
    "q20_bucketed_join" -> ((s, dir) => {
      graft.sources.Bucketed.writeTable(
        t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        "graft_q20_orders", "o_custkey", 16)
      graft.sources.Bucketed.writeTable(
        t(s, dir, "customer")
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        "graft_q20_customer", "o_custkey", 16)
      graft.sources.Bucketed.join(
        s, "graft_q20_orders", "graft_q20_customer", "o_custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          Relational.moneySum(col("o_totalprice")).as("revenue"))
        .orderBy(desc("n_orders"), asc("c_mktsegment"))
    }),

    // Deterministic stratified sampling: per-stratum keep-fractions via
    // the portable key hash (URGENT 20%, LOW 10%, default 5%) — exact
    // membership, SQL-checkable, unlike seeded Bernoulli sampleBy.
    "fp_stratified_sample" -> ((s, dir) =>
      Features.hashStratifiedSample(t(s, dir, "orders"),
          "o_orderpriority", "o_orderkey",
          Map("1-URGENT" -> 2000, "5-LOW" -> 1000), defaultBp = 500)
        .select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey")),

    // EXT leave-one-out smoothed target encoding (label = order status
    // 'F'): per-row LOO collapses to at most two encodings per
    // category, so the compact (category, y) surface checks EVERY
    // row's feature value — max=min within each group is asserted
    // in-plan rather than averaged away.
    "fp_target_encode" -> ((s, dir) => {
      val enc = Features.targetEncodeLoo(t(s, dir, "orders"),
        "o_orderpriority", col("o_orderstatus") === "F", m = 20)
      enc.groupBy("o_orderpriority", "y")
        .agg(count(lit(1)).as("n_rows"), max("prior_bp").as("prior_bp"),
          max("enc_bp").as("enc_bp"), min("enc_bp").as("enc_lo"))
        .where(assert_true(col("enc_bp") === col("enc_lo"),
          lit("LOO encoding must be constant within (category, label)"))
          .isNull)
        .select("o_orderpriority", "y", "n_rows", "prior_bp", "enc_bp")
        .orderBy("o_orderpriority", "y")
    }),

    // EXT calibration report: two scorers through the same reliability
    // diagram — the LOO target encoding (a genuinely calibrated
    // forecast: tiny ECE, its mass in one fine bin) vs a sham score
    // with spread but no signal (flat observed rate under a rising
    // predicted rate: the big ECE AUC never shows). Each report is a
    // ≤bins-row hash agg + 1-row broadcast.
    "fp_calibration" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val enc = Features.targetEncodeLoo(orders,
        "o_orderpriority", col("o_orderstatus") === "F", m = 20)
      val calibrated = Features
        .calibrationReport(enc, col("enc_bp"), col("y"), nBins = 100)
        .withColumn("scorer", lit("loo_encoding"))
      val sham = orders.select(
        (col("o_orderkey") % 100 * 100 + 50).as("p"),
        (col("o_orderstatus") === "F").cast("long").as("y"))
      val lying = Features
        .calibrationReport(sham, col("p"), col("y"), nBins = 10)
        .withColumn("scorer", lit("sham_spread"))
      calibrated.unionByName(lying)
        .select("scorer", "bin", "n", "mean_pred_bp", "rate_bp",
          "gap_bp", "ece_bp")
        .orderBy("scorer", "bin")
    }),

    // EXT cohort LTV: cumulative revenue per customer by months since
    // first purchase, by acquisition month — integer months/cents, the
    // cumulative window over the (cohort × age) aggregate, never raw
    // orders.
    "q44_cohort_ltv" -> ((s, dir) =>
      Relational.cohortLtv(t(s, dir, "orders"))),

    // EXT ABC classification: how many parts carry 80% / 95% of
    // revenue — share cut points on the rank-ordered cumulative curve
    // (not fixed-population deciles), exact cents, distributed prefix
    // sum over the packed desc-key; packing + boundary products
    // in-plan guarded.
    "q46_abc_class" -> ((s, dir) =>
      Relational.abcClassification(t(s, dir, "lineitem"), "l_partkey",
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))),

    // EXT order-to-ship lead time over the FACT⋈FACT equi-join
    // (lineitem ⋈ orders on orderkey — at warehouse scale the
    // bucketed/co-partitioned join shape q20 demonstrates; here AQE's
    // sort-merge is the right default): per priority, exact day-lag
    // stats with the signed-floor average (this corpus's synthetic
    // dates produce negative lags — precisely the pmod-identity case).
    "q48_lead_time" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderpriority"),
        (unix_micros(col("o_orderdate").cast("timestamp"))
          / lit(86400000000L)).cast("long").as("od"))
      val l = t(s, dir, "lineitem").select(
        col("l_orderkey").as("o_orderkey"),
        (unix_micros(col("l_shipdate").cast("timestamp"))
          / lit(86400000000L)).cast("long").as("sd"))
      l.join(o, "o_orderkey")
        .withColumn("lag", col("sd") - col("od"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), min("lag").as("min_days"),
          max("lag").as("max_days"), sum("lag").as("sum_days"),
          sum((col("lag") < 0).cast("long")).as("n_negative"))
        .withColumn("avg_days_milli",
          expr("(sum_days * 1000 - pmod(sum_days * 1000, n)) div n"))
        .select("o_orderpriority", "n", "min_days", "max_days",
          "sum_days", "n_negative", "avg_days_milli")
        .orderBy("o_orderpriority")
    }),

    // EXT skyline: the Pareto frontier of (price, size) over part —
    // sort-based distributed prefix-max, O(n log n) vs the oracle's
    // textbook O(n²) NOT-EXISTS dominance check (fine at sf0.01; the
    // Spark plan is what runs at scale).
    "q45_skyline" -> ((s, dir) =>
      Relational.skyline(
        t(s, dir, "part").select(
          expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("cost"),
          col("p_size").as("gain")),
        "cost", "gain")),

    // EXT exact AUC: Mann-Whitney U in pure integers (×2 midranks
    // absorb ties) over the distinct-score table — the hash-oracled
    // companion to the ML family's float AUC floors; degenerate
    // one-class inputs fail loudly.
    "fp_auc_exact" -> ((s, dir) => {
      val enc = Features.targetEncodeLoo(t(s, dir, "orders"),
        "o_orderpriority", col("o_orderstatus") === "F", m = 20)
      Features.aucExact(enc, col("enc_bp"), col("y"))
    }),

    // EXT JSONL sink + explicit-schema source round-trip (the LLM-corpus
    // interchange format), then an aggregate — oracle is the plain
    // aggregate over the parquet original. Same pid-scoped tmp dir
    // convention as the other sink queries.
    "sink_jsonl_roundtrip" -> ((s, dir) => {
      val out = java.nio.file.Paths
        .get(System.getProperty("java.io.tmpdir"),
          s"graft-jsonl-${ProcessHandle.current().pid()}")
        .toString
      graft.sources.Jsonl.write(
        t(s, dir, "documents").select("doc_id", "lang", "n_chars"), out)
      graft.sources.Jsonl.read(s, out,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("lang",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_chars",
            org.apache.spark.sql.types.LongType))))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
        .orderBy("lang")
    }),

    // EXT schema evolution: two parquet batches written with DIFFERENT
    // schemas (the second adds a column), read back via mergeSchema —
    // old rows surface nulls for the new column. The steady state of any
    // long-lived corpus; the oracle reconstructs the null pattern.
    "sink_schema_evolution" -> ((s, dir) => {
      val base = java.nio.file.Paths
        .get(System.getProperty("java.io.tmpdir"),
          s"graft-evolve-${ProcessHandle.current().pid()}")
        .toString
      val orders = t(s, dir, "orders")
      orders.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$base/batch1")
      orders.filter(col("o_orderkey") % 2 === 1)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$base/batch2")
      s.read.option("mergeSchema", true)
        .parquet(s"$base/batch1", s"$base/batch2")
        .groupBy(coalesce(col("o_orderpriority"), lit("<pre-evolution>"))
          .as("priority"))
        .agg(count(lit(1)).as("cnt"),
          Relational.moneySum(col("o_totalprice")).as("revenue"))
        .orderBy("priority")
    }),

    // T4 feature prep (FP1/FP3/FP4) as oracle-checkable transforms:
    // frequency-ranked label encoding of two categorical columns.
    "fp_string_index" -> ((s, dir) =>
      Features.stringIndex(t(s, dir, "orders"),
          Seq("o_orderpriority", "o_orderstatus"))
        .select("o_orderkey", "o_orderpriority_idx", "o_orderstatus_idx")
        .orderBy("o_orderkey")),

    // Exact 20-quantile bucketing — distributed range-partitioned ntile
    // (no single-partition window; oracle is the literal SQL ntile).
    "fp_quantile_bucket" -> ((s, dir) =>
      Features.rangeNtileBucket(t(s, dir, "orders"), "o_totalprice", "o_orderkey", 20)
        .select("o_orderkey", "bucket")
        .orderBy("o_orderkey")),

    // Null imputation: synthesize nulls (corpus has none), then the ref's
    // numeric→-1 / string→'-1' fill.
    "fp_na_fill" -> ((s, dir) =>
      Features.naFill(
        t(s, dir, "customer")
          .withColumn("c_acctbal",
            when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
          .withColumn("c_mktsegment",
            when(col("c_nationkey") % 5 === 0, lit(null))
              .otherwise(col("c_mktsegment"))))
        .select("c_custkey", "c_acctbal", "c_mktsegment")
        .orderBy("c_custkey")),

    // Deterministic hash split (the reproducible randomSplit replacement;
    // portable affine hash => oracle-checkable assignment, ~20% test).
    "fp_hash_split" -> ((s, dir) =>
      Features.hashSplit(t(s, dir, "orders"), "o_orderkey", 2000)
        .select("o_orderkey", "split")
        .orderBy("o_orderkey")),

    // EXT inverse-propensity weights for the deterministic stratified
    // sample: per-stratum reweighting factors + the floor round-trip
    // error — the bookkeeping that keeps downsampled estimates honest;
    // a stratum sampled to zero fails loudly in-plan.
    "fp_propensity_weights" -> ((s, dir) =>
      Features.propensityWeights(t(s, dir, "orders"), "o_orderpriority",
        "o_orderkey", Map("1-URGENT" -> 2000, "5-LOW" -> 1000),
        defaultBp = 500)),

    // EXT isotonic calibration: the PAV-equivalent max-min identity over
    // 16 exact score ntiles — monotone fit, hash-exact doubles (every
    // mean is double(BIGINT)/double(BIGINT)); the corpus collapses to
    // 16 rows before the O(B^3) identity runs.
    "fp_isotonic" -> ((s, dir) =>
      Features.isotonicBins(
        Features.rangeNtileBucket(t(s, dir, "orders"), "o_totalprice",
          "o_orderkey", 16),
        "bucket", col("o_orderstatus") === "F")),

    // EXT deterministic k-fold CV partition + per-fold class-balance
    // report: fold is a pure affine-hash function of the key (auditable,
    // repartition-stable), the report is the k-row table read before
    // trusting a CV estimate. Map-only assignment, one k-row aggregate.
    "fp_kfold" -> ((s, dir) =>
      Features.kfoldReport(t(s, dir, "orders"), "o_orderkey",
        col("o_orderstatus") === "F")),

    // T4 classifiers (FP6-FP12), seeded; rows-only (never oracle'd).
    "ml_train_eval" -> ((s, dir) =>
      graft.ml.Classifiers.trainEval(
        s, graft.ml.Classifiers.embeddingFeatures(t(s, dir, "embeddings")))),
    "ml_rf_importances" -> ((s, dir) =>
      graft.ml.Classifiers.rfImportances(
        s, graft.ml.Classifiers.embeddingFeatures(t(s, dir, "embeddings")))),
    // S6 model persistence: fit → save → reload → re-score, bitwise
    // parity asserted in-plan (rows-only: RF fits have no DuckDB twin)
    "ml_model_roundtrip" -> ((s, dir) =>
      graft.ml.Classifiers.modelRoundtrip(
        s, graft.ml.Classifiers.embeddingFeatures(t(s, dir, "embeddings")))),

    // FP1+FP3+FP5 end-to-end feature pipeline on the EXACT twins
    // (distributed index dictionaries + distributed exact ntile) with a
    // real VectorAssembler — fully oracle'd, vector surfaced as SCALARS
    // (length + fixed-format CSV; the driver's pandas checker cannot
    // hash an array column — the one red cell of CORRECTNESS_r01). The
    // spark.ml estimator Pipeline (GK-sketch discretizer, approximate by
    // design) is covered by MlPipelineSpec, not a hash oracle.
    "fp_pipeline_assemble" -> ((s, dir) => {
      val out = graft.ml.Pipelines.exactAssembled(t(s, dir, "orders"),
        Seq("o_orderpriority", "o_orderstatus"), "o_totalprice",
        "o_orderkey", 20)
      val arr = org.apache.spark.ml.functions.vector_to_array(col("features"))
      out.select(col("o_orderkey"),
          size(arr).cast("long").as("n_features"),
          array_join(transform(arr,
            x => x.cast(org.apache.spark.sql.types.DecimalType(18, 6))
              .cast("string")), ",").as("features_csv"))
        .orderBy("o_orderkey")
    }),

    // EXT token-set dedup: same-word-set docs collapse regardless of
    // order/repetition — zero pairwise work, one fingerprint shuffle.
    "dedup_token_set" -> ((s, dir) =>
      Dedup.tokenSetDedup(t(s, dir, "documents"))),

    // EXT edit-distance near-dup: banded Levenshtein over blocked
    // (lang, length-bucket) candidates — the character-level dedup family
    // (catches small in-place edits that shingle Jaccard underweights).
    "dedup_edit_distance" -> ((s, dir) =>
      Dedup.editDistancePairs(t(s, dir, "documents"))),

    // EXT weekly cohort retention on purchase events: distinct activity
    // matrix + self-join on (user, week+7d) — no window, no range join.
    "events_retention" -> ((s, dir) =>
      Events.weeklyRetention(t(s, dir, "events"))),

    // EXT forward-fill (LOCF): per-user running last non-null value; the
    // corpus has no NULLs so every 5th event is blanked deterministically
    // first (same synthesize-then-operate pattern as q3_3).
    "events_ffill" -> ((s, dir) =>
      Events.forwardFill(t(s, dir, "events"))),

    // EXT navigation-window family: lead / first_value / nth_value /
    // ntile over one shared spec (one sort-shuffle; the ranking family is
    // q32). Unique sort key (date, key) => tie-free, deterministic.
    "q33_window_nav" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_totalprice"))
        .withColumn("next_key", lead("o_orderkey", 1).over(w))
        .withColumn("first_cents",
          round(first(col("o_totalprice")).over(w) * 100).cast("long"))
        .withColumn("second_key", nth_value(col("o_orderkey"), 2).over(w))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .drop("o_orderdate", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // EXT higher-order array functions over embeddings: map-only
    // per-vector profile (codegen filter/transform/aggregate, no explode).
    "embed_hof_stats" -> ((s, dir) =>
      Similarity.hofStats(t(s, dir, "embeddings"))),

    // EXT audited covariance/power-iteration step: G = Σ qqᵀ as a
    // dims²-cell aggregate + v1 = G·1 — the PCA/whitening primitive
    // hash-oracled exactly (the kmeansStep discipline on second
    // moments); one vec-keyed shuffle, then 4096 rows.
    "embed_cov_power" -> ((s, dir) =>
      Similarity.covPowerStep(t(s, dir, "embeddings"))),

    // EXT dynamic partition pruning: fact partitioned on disk by
    // priority, dim filtered on a non-partition attribute — the scan must
    // prune partitions at RUNTIME from the broadcast dim (PlanShapeSpec
    // asserts dynamicpruning in PartitionFilters). At 100 TB this is the
    // difference between listing 2/5 of the directories and scanning all.
    "dpp_partitioned_join" -> ((s, dir) => {
      import s.implicits._
      val out = java.nio.file.Paths
        .get(System.getProperty("java.io.tmpdir"),
          s"graft-dpp-${ProcessHandle.current().pid()}")
        .toString
      graft.sources.Partitioned.write(t(s, dir, "orders"), out, "o_orderpriority")
      // the dim must be a real table scan: a literal local relation gets
      // its filter constant-folded away, and with no selective Filter on
      // the dim side the DPP rule (correctly) declines to prune
      Seq(
        ("1-URGENT", "expedite"), ("2-HIGH", "expedite"),
        ("3-MEDIUM", "standard"), ("4-NOT SPECIFIED", "standard"),
        ("5-LOW", "standard")).toDF("priority", "sla")
        .write.mode("overwrite").parquet(s"$out-dim")
      s.read.parquet(out)
        .join(broadcast(s.read.parquet(s"$out-dim")
          .filter(col("sla") === "expedite")),
          col("o_orderpriority") === col("priority"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          Relational.moneySum(col("o_totalprice")).as("revenue"))
        .orderBy("o_orderpriority")
    }),

    // EXT ORC source/sink round-trip (vectorized reader, predicate
    // pushdown into stripe indexes — second columnar format).
    "sink_orc_roundtrip" -> ((s, dir) => {
      val out = java.nio.file.Paths
        .get(System.getProperty("java.io.tmpdir"),
          s"graft-orc-${ProcessHandle.current().pid()}")
        .toString
      graft.sources.Orc.write(
        t(s, dir, "lineitem")
          .select("l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice"), out)
      graft.sources.Orc.read(s, out)
        .filter(col("l_quantity") <= 10)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"),
          Relational.moneySum(col("l_extendedprice")).as("revenue"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // EXT correlated SCALAR subquery: orders priced above their own
    // customer's average. Catalyst decorrelates the per-row subquery into
    // one aggregate + join — never a per-row re-scan (q30 covers the
    // EXISTS flavor; this is the scalar flavor). The HAVING-style compare
    // is integer-cents vs DECIMAL avg surfaced as exact comparison on
    // both engines via > with the same DECIMAL math.
    "q34_scalar_subquery" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      s.sql("""
        SELECT o_orderkey, o_custkey
        FROM g_orders o
        WHERE CAST(o_totalprice AS DECIMAL(18,2)) >
              (SELECT avg(CAST(o_totalprice AS DECIMAL(18,2)))
               FROM g_orders i WHERE i.o_custkey = o.o_custkey)
        ORDER BY o_orderkey""")
    }),

    // EXT benchmark decontamination: corpus docs sharing >= 3 distinct
    // word trigrams with the (broadcast) benchmark slice are flagged —
    // the keep-eval-out-of-training stage of an LLM data pipeline.
    "decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.contamination(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0))
    }),
    // EXT contamination MATRIX: the decontaminate gate stratified to a
    // (training source × benchmark source) grid — which domains leak
    // into which eval sets, and how badly; the release-review view.
    "decontaminate_matrix" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.contaminationMatrix(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0))
    }),
    // EXT packing-efficiency report: sequence count, padding waste bp,
    // boundary-straddler count at budget 256 — the number a training
    // run's context-budget choice is negotiated against.
    "pack_efficiency" -> ((s, dir) =>
      TextAnalysis.packEfficiency(t(s, dir, "documents"))),

    // EXT per-source quota capping (data mixing): keep the 10 lowest-id
    // docs per source so no domain dominates the mix.
    "fp_source_quota" -> ((s, dir) =>
      Features.sourceQuota(t(s, dir, "documents"), cap = 10)),

    // EXT temperature resampling (α = ½): per-source keep rates from
    // integer isqrt arithmetic + portable-hash membership; reports
    // source, n_docs, rate_bp, n_kept.
    "corpus_temperature_sample" -> ((s, dir) =>
      Features.temperatureSample(t(s, dir, "documents"))),

    // EXT minority oversampling: whole-number replication rep = n_max
    // div n_class per language (residual imbalance ≤ 2× by the floor
    // policy) — deterministic, no RNG, so the rebalanced corpus itself
    // hash-oracles; broadcast class table + map-side explode, the fact
    // side never shuffles.
    "fp_oversample" -> ((s, dir) =>
      Features.oversampleMinority(
        t(s, dir, "documents").select("doc_id", "lang"), "lang")
        .select("doc_id", "lang", "n_class", "rep", "copy_idx")
        .orderBy("doc_id", "copy_idx")),

    // EXT curriculum schedule: easy→hard stages by exact n_chars ntile,
    // seeded hash shuffle within stages, exact global positions via the
    // distributed running total — the bit-reproducible data order a
    // curriculum training run replays; id-width overflow asserted
    // in-plan.
    "corpus_curriculum" -> ((s, dir) =>
      Features.curriculumSchedule(
        t(s, dir, "documents").select("doc_id", "source", "n_chars"),
        difficulty = "n_chars", key = "doc_id")
        .select("doc_id", "source", "n_chars", "stage", "shuffle_key",
          "position")
        .orderBy("position")),

    // EXT normalization dedup: the corpus decorated with casing/punct/
    // whitespace noise (ids offset) collapses back onto the originals
    // under canonical-form dedup — exact-dedup cost, no pairwise work.
    "dedup_normalized" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val noisy = docs.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("  "), upper(col("text")), lit("!!")).as("text"))
      Dedup.normalizedDedup(docs.unionByName(noisy))
    }),

    // EXT RANGE-interval window frame: per-user rolling 1-hour sum over
    // EVENT TIME (value-based frame — q19's ROWS frames count rows; a
    // range frame bounds by the ORDER key's value, so ties are peers and
    // the result is order-independent). Integer cents keep it exact.
    "q35_range_frame" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val w = Window.partitionBy("user_id").orderBy("us")
        .rangeBetween(-3600000000L, 0L)
      ev.select(col("event_id"), col("user_id"), Events.tsUs(ev).as("us"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("roll_cents", sum("cents").over(w))
        .select("event_id", "user_id", "roll_cents")
        .orderBy("event_id")
    }),

    // EXT intra-doc repetition stats (Gopher repetition rules): duplicate
    // and top-bigram occurrence fractions per document — the within-doc
    // quality twin of the corpus-level dedup family.
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionStats(t(s, dir, "documents"))),

    // EXT inverted index: term -> full df + the 20 lowest containing doc
    // ids (truncated posting lists bound every output row at any scale).
    "inverted_index" -> ((s, dir) =>
      TextAnalysis.invertedIndex(t(s, dir, "documents"))),

    // EXT sequence-packing manifest: exact global token offsets in
    // doc_id order via the DISTRIBUTED prefix sum (derived range slices
    // + broadcast offsets — no single-partition window over raw rows).
    "pack_sequences" -> ((s, dir) =>
      TextAnalysis.packSequences(t(s, dir, "documents"))),

    // EXT hourly resample + gap fill (LOCF on the dense per-user grid).
    "events_resample" -> ((s, dir) =>
      Events.resampleHourly(t(s, dir, "events"))),

    // EXT rolling z-score anomaly flags — integer-exact variance test
    // over the 24 preceding events per user, no division anywhere.
    "events_anomaly" -> ((s, dir) =>
      Events.rollingAnomaly(t(s, dir, "events"))),

    // EXT snapshot diff: the change feed between two materializations
    // (B = A with every 10th price bumped, every 100th key dropped, a
    // shifted copy of every 50th added — same synthesize-then-operate
    // pattern as cdc_apply, whose inverse this is).
    "table_diff" -> ((s, dir) => {
      val snapA = t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      val snapB = snapA.filter(col("o_orderkey") % 100 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 10 === 0, col("o_totalprice") + 1000.0d)
            .otherwise(col("o_totalprice")))
        .unionByName(snapA.filter(col("o_orderkey") % 50 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            col("o_totalprice"), col("o_orderstatus")))
      graft.ops.Cdc.snapshotDiff(snapA, snapB, "o_orderkey",
        Seq("o_totalprice", "o_orderstatus"))
    }),
  )
}
