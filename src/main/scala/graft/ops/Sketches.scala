package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Portable, Texty}

/** Fixed-size probabilistic summaries over unbounded key streams (EXT —
  * the 100 TB observability toolkit): a Count-Min frequency sketch and a
  * Bloom-filter semi-join reducer. Both are built on the portable
  * two-prime hash basis ([[graft.functions.Portable]]) so every counter,
  * bit position and estimate is reproducible in generated DuckDB SQL —
  * the sketches themselves are oracle-checkable, not just their
  * consumers (same discipline as the MinHash/SimHash family).
  *
  * Contrast with [[graft.ops.TextAnalysis.heavyHitters]] (Misra-Gries:
  * exact after rescore, answers "what are the top keys") — the CMS here
  * answers point frequency queries ("how often did THIS key occur")
  * against state that is O(depth·width) REGARDLESS of corpus size, the
  * summary a 100 TB pipeline keeps per shard/day when the key universe
  * (tokens, URLs, user ids) cannot be materialized.
  */
object Sketches {

  /** Count-Min depth (independent hash rows) and width (counters per
    * row) — 3×1024 longs = 24 KB of state. Estimates overshoot truth by
    * at most ~2·N/width with prob. (1/2)^depth (standard CM bound);
    * width is the knob to grow at scale, state stays KB-sized. */
  val CmsDepth = 3
  val CmsWidth = 1024L
  /** Affine-rehash seed offsets (disjoint from MinHash 0..31, SimHash
    * 0..59 usage is on the (h1,h2) pair basis; these index aCoef/bCoef
    * directly like fp_shuffle_order's 11). */
  val CmsSeedBase = 40
  val BloomSeedBase = 50

  private def affineBucket(h: Column, i: Int, width: Long): Column =
    ((lit(Portable.aCoef(i)) * h + lit(Portable.bCoef(i))) % lit(Portable.P1)) % lit(width)

  /** Build the Count-Min counter table from one row per key OCCURRENCE:
    * depth rows × width counters, counter(r, b) = #occurrences whose
    * row-r hash lands in bucket b. One partial-aggregated shuffle whose
    * key space is depth·width cells — map-side combine collapses each
    * map partition to ≤ depth·width rows no matter how many billions of
    * occurrences flow in, which is the whole point of the sketch.
    * `keyCol` must be a string column; hashing is the shared portable
    * rolling hash so the oracle can re-derive every cell. */
  def cmsBuild(occurrences: DataFrame, keyCol: String,
      depth: Int = CmsDepth, width: Long = CmsWidth,
      seedBase: Int = CmsSeedBase): DataFrame =
    cmsBuildWeighted(occurrences.select(col(keyCol), lit(1L).as("__w")),
      keyCol, "__w", depth, width, seedBase)

  /** [[cmsBuild]] from PRE-AGGREGATED (key, count) rows — when a
    * per-key count table already exists (or the consumer needs it
    * anyway, as sketch_cms does for its truth column), feeding it here
    * means the raw occurrences are scanned once for the counts and the
    * sketch is derived from the vocabulary-sized table, not a second
    * pass over the corpus. Hashes each distinct key once. */
  def cmsBuildWeighted(counts: DataFrame, keyCol: String, cntCol: String,
      depth: Int = CmsDepth, width: Long = CmsWidth,
      seedBase: Int = CmsSeedBase): DataFrame = {
    counts
      .select(Texty.rollingHash(col(keyCol)).as("h"), col(cntCol).as("__w"))
      .select(explode(array((0 until depth).map { r =>
        struct(lit(r).as("r"),
          affineBucket(col("h"), seedBase + r, width).as("bucket"))
      }: _*)).as("c"), col("__w"))
      .groupBy(col("c.r").as("r"), col("c.bucket").as("bucket"))
      .agg(sum("__w").as("counter"))
  }

  /** Point-frequency estimates for `probes` (distinct string keys in
    * `keyCol`): min over the depth rows of the addressed counters —
    * never undercounts, overcounts only on hash collisions. The counter
    * table is depth·width rows → broadcast; the probe side never
    * shuffles. Missing cells coalesce to 0 (a key the sketch never saw
    * estimates 0 only if at least one of its cells was untouched). */
  def cmsEstimate(counters: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int = CmsDepth, width: Long = CmsWidth,
      seedBase: Int = CmsSeedBase): DataFrame = {
    probes
      .withColumn("h", Texty.rollingHash(col(keyCol)))
      .select(col(keyCol),
        explode(array((0 until depth).map { r =>
          struct(lit(r).as("r"),
            affineBucket(col("h"), seedBase + r, width).as("bucket"))
        }: _*)).as("c"))
      .select(col(keyCol), col("c.r").as("r"), col("c.bucket").as("bucket"))
      .join(broadcast(counters), Seq("r", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("counter"), lit(0L))).as("cms_est"))
  }

  /** HyperLogLog geometry: 2¹⁰ = 1024 registers, 40-bit rho source.
    * Standard error 1.04/√m ≈ 3.25% — measured 2.8–4.3% on the corpus
    * key universes (BASELINE.md round 5). */
  val HllM = 1024L
  val HllVBits = 40
  val HllSeedBase = 60
  /** alpha_m · m² · 2^HllVBits·2 — the estimator numerator, precomputed
    * so both engines do ONE double division of exact integers (the
    * er_fuzzy_match determinism discipline; the long→double conversion
    * of sum_scaled is IEEE-nearest in both). */
  val HllC: Double = 0.7213 / (1.0 + 1.079 / 1024.0) * 1024.0 * 1024.0 *
    math.pow(2.0, HllVBits + 1)

  /** HLL register table over a NON-NEGATIVE long key column: one
    * partial-aggregated shuffle of ≤ m rows per map partition (max is
    * decomposable), state m integers forever — the approx-distinct
    * summary that, unlike Spark's approx_count_distinct (engine-private
    * HLL++ encoding, rows-only in profile_approx), is built on portable
    * arithmetic and therefore ORACLE-CHECKABLE end to end.
    *
    * Hash design, each step forced by cross-engine exactness:
    * - QUADRATIC two-prime mix `((q²%p)·a + q·b) % p` — the affine map
    *   is a permutation whose arithmetic-progression structure biased
    *   raw-HLL +36% on sequential keys (measured); squaring breaks the
    *   linearity while every intermediate stays < 2·10¹⁸ (no BIGINT
    *   overflow — DuckDB errors on wrap, so wrap-around mixers like
    *   splitmix are out).
    * - rho source `(h div m) mod 2⁴⁰`: the combined range P1·P2 ≈
    *   0.866·2⁶⁰ is not a power of two, which inflates every
    *   leading-zero probability by 1/0.866 (+15% estimate bias,
    *   measured); folding mod 2⁴⁰ wraps ~887 full cycles → uniform to
    *   ~0.1%.
    * - rho via `41 − length(bin(v))` — bin() exists in BOTH engines and
    *   is integer-exact, no floor(log2) float roulette.
    *
    * Raw HLL only: the n ≲ 2.5m small-range regime reads high (the
    * linear-counting branch needs ln(), which is not correctly-rounded
    * across libms — the one float that CAN'T be made portable); size
    * the register count to the expected cardinality instead. */
  def hllRegisters(keys: DataFrame, keyCol: String,
      seedBase: Int = HllSeedBase): DataFrame =
    hllRegistersBy(keys, keyCol, Nil, seedBase)

  /** Per-GROUP register tables in one pass: `(groupCols..., bucket, reg)`
    * — the shuffle key space is |groups|·m cells and max is decomposable,
    * so a billion-key stream still partial-aggregates to ≤ |groups|·m
    * rows per map partition. One sketch per group for the price of one
    * scan is what makes approx-distinct-by-dimension viable at 100 TB
    * (exact countDistinct per group re-shuffles the raw keys). */
  def hllRegistersBy(keys: DataFrame, keyCol: String,
      groupCols: Seq[String], seedBase: Int = HllSeedBase): DataFrame =
    keys
      .select(col(keyCol).cast("long").as("k") +: groupCols.map(col): _*)
      .withColumn("h", quadHash(col("k"), seedBase))
      .select(Seq((col("h") % lit(HllM)).as("bucket"),
        expr(s"(h div $HllM) % ${1L << HllVBits}").as("v"))
        ++ groupCols.map(col): _*)
      .withColumn("rho", when(col("v") === 0, lit(HllVBits + 1))
        .otherwise(lit(HllVBits + 1) - length(expr("bin(v)"))))
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("rho").as("reg"))

  /** The quadratic two-prime mix shared by the HLL and KMV sketches —
    * `(((k² mod p)·a + k·b) mod p)` per prime, CRT-combined to a value
    * uniform on [0, P1·P2). See [[hllRegisters]] for why each step is
    * shaped this way (permutation-bias, overflow, portability). */
  private[graft] def quadHash(key: Column, seedBase: Int): Column = {
    import graft.functions.Portable.{P1, P2, aCoef, bCoef}
    val (a1, b1) = (aCoef(seedBase), bCoef(seedBase))
    val (a2, b2) = (aCoef(seedBase + 1), bCoef(seedBase + 1))
    val q1 = key % lit(P1)
    val q2 = key % lit(P2)
    ((q1 * q1 % lit(P1)) * lit(a1) + q1 * lit(b1)) % lit(P1) * lit(P2) +
      ((q2 * q2 % lit(P2)) * lit(a2) + q2 * lit(b2)) % lit(P2)
  }

  /** One-row estimate from the register table: `round(C / sum_scaled)`
    * where `sum_scaled = Σ 2^(41−reg)` with empty buckets contributing
    * 2⁴¹ — the harmonic mean kept in exact integers until the single
    * final division. */
  def hllSummary(regs: DataFrame): DataFrame = hllSummaryBy(regs, Nil)

  /** [[hllSummary]] per group — one estimate row per distinct
    * `groupCols` value in a [[hllRegistersBy]] table. */
  def hllSummaryBy(regs: DataFrame, groupCols: Seq[String]): DataFrame =
    regs
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_used"),
        // coalesce: an EMPTY register table (empty input stream) has a
        // null sum; all-empty-buckets then estimates ~0.72·m, the raw
        // estimator's documented small-range floor, instead of null
        coalesce(sum(call_function("shiftleft", lit(1L),
          (lit(HllVBits + 1) - col("reg")).cast("int"))), lit(0L))
          .as("used_scaled"))
      .select(groupCols.map(col) ++ Seq(col("n_used"),
        (lit(HllM) - col("n_used")).as("zeros"),
        (col("used_scaled")
          + (lit(HllM) - col("n_used")) * lit(1L << (HllVBits + 1)))
          .as("sum_scaled")): _*)
      .withColumn("est_distinct",
        round(lit(HllC) / col("sum_scaled").cast("double")).cast("long"))

  /** Sliding-window distinct from per-day sketches: for each day, merge
    * the trailing `windowDays` days' register tables by the max law and
    * estimate — the classic "7-day distinct" that exact methods must
    * rescan the whole window for, answered here from day-sketch state
    * alone (≤ m rows per day, forever). The day×window range join runs
    * over SKETCH rows (days × m), not data: broadcast-joinable at any
    * corpus size, which is the entire point. Input: a
    * [[hllRegistersBy]] table grouped by `day`. */
  def hllSlidingSummary(regsByDay: DataFrame, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays >= 1, got $windowDays")
    val days = regsByDay.select(col("day")).distinct()
    val merged = days.as("d").join(regsByDay.as("r"),
        col("r.day") <= col("d.day") &&
          col("r.day") > col("d.day") - windowDays)
      .groupBy(col("d.day").as("day"), col("r.bucket").as("bucket"))
      .agg(max(col("r.reg")).as("reg"))
    hllSummaryBy(merged, Seq("day"))
  }

  /** Register-wise max of two register tables — the HLL MERGE LAW:
    * `regs(A ∪ B) = max(regs(A), regs(B))` exactly, because each
    * register is itself a max over its bucket's stream. This is the
    * whole reason a 100 TB pipeline keeps sketches per shard/day: union
    * cardinality across any ad-hoc slice combination is a KB-sized
    * merge, never a re-scan. Exactness (not approximate-on-approximate)
    * is what the sketch_hll_union oracle pins. */
  def hllMergeRegisters(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b).groupBy("bucket").agg(max("reg").as("reg"))

  /** KMV (k-minimum-values / bottom-k) sketch: the k smallest
    * [[quadHash]] values over the DISTINCT keys. TakeOrdered physical
    * plan — each partition keeps its own k smallest, the driver merges
    * k-sized heaps, nothing ever shuffles. Doubles as a uniform sample
    * of the distinct-key universe (hash order is oblivious to key
    * semantics), which is its second job in practice: distinct-count
    * AND a representative key sample from one bounded pass. */
  def kmvBottom(keys: DataFrame, keyCol: String, k: Int = KmvK,
      seedBase: Int = HllSeedBase): DataFrame =
    keys
      .select(col(keyCol).cast("long").as("k")).distinct()
      .select(quadHash(col("k"), seedBase).as("h"))
      .orderBy("h").limit(k)

  /** One-row KMV estimate: `(k−1) · R / h_k` where R = P1·P2 is the
    * hash range — the classic bottom-k estimator (Bar-Yossef et al.,
    * "Counting distinct elements in a data stream", RANDOM 2002). The
    * numerator (k−1)·R overflows BIGINT, so both engines compute the
    * SAME three correctly-rounded double ops (cast, multiply-by-literal,
    * divide) then round — the er_fuzzy_match / HllC determinism
    * discipline. When fewer than k distinct hashes exist the bottom-k
    * IS the universe and the count is exact. */
  def kmvSummary(bottom: DataFrame, k: Int = KmvK): DataFrame = {
    import graft.functions.Portable.{P1, P2}
    val numer = (k - 1).toDouble * (P1 * P2).toDouble
    bottom
      .agg(count(lit(1)).as("k_used"), max("h").as("kth_hash"))
      .withColumn("est_distinct",
        when(col("k_used") < k, col("k_used"))
          .otherwise(round(lit(numer) / col("kth_hash").cast("double"))
            .cast("long")))
  }

  /** Default KMV size: relative error ~1/√(k−1) ≈ 6.3%. */
  val KmvK = 256

  /** Per-GROUP bottom-k over the distinct keys: a deterministic
    * STRATIFIED distinct-key sample (k representatives per stratum,
    * hash-order = semantics-oblivious) that is simultaneously each
    * stratum's KMV basis. Group-keyed rank window — each partition
    * sorts only its own postings; ties on h broken by key so the
    * sample is reproducible under hash collisions. */
  def kmvBottomBy(keys: DataFrame, keyCol: String, groupCols: Seq[String],
      k: Int = KmvK, seedBase: Int = HllSeedBase): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy("h", "k")
    keys
      .select(groupCols.map(col) :+ col(keyCol).cast("long").as("k"): _*)
      .distinct()
      .withColumn("h", quadHash(col("k"), seedBase))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(groupCols.map(col)
        ++ Seq(col("k").as(keyCol), col("h"), col("rn")): _*)
  }

  /** KMV set-RESEMBLANCE: the Jaccard similarity of two key sets
    * estimated from their bottom-k sketches alone — the sketch-sized
    * answer to "how much do these two slices' vocabularies / user
    * bases / part mixes overlap", where the exact answer needs both
    * full distinct sets co-shuffled. The estimator (Bar-Yossef et al.'s
    * bottom-k coordinated sample): take the k smallest hashes of A ∪ B
    * and count how many belong to both sets; `n_both / k_used` is an
    * unbiased Jaccard estimate with ±1/√k error.
    *
    * The membership flags are EXACT from the two sketches: any element
    * of bottom-k(A ∪ B) that lies in A has rank ≤ k within A's hash
    * order too, so it necessarily appears in bottom-k(A) — no second
    * look at the data. That closure property is why coordinated
    * bottom-k samples compose (the same argument that makes
    * [[kmvBottom]]'s union merge law exact), and it is what a pair of
    * INDEPENDENT per-set samples would not give.
    *
    * Both per-set sketches are TakeOrdered plans (per-partition heaps,
    * no shuffle); the merge touches 2k rows. Ties on h break by key so
    * the sketch — and therefore the estimate — is bit-reproducible.
    * Output: one row (k_used, kth_hash, n_both, jacc_bp). The exact
    * Jaccard stays out of the operator on purpose — at scale it does
    * not exist cheaply; the registered query's oracle recomputes BOTH
    * the sketch estimate and the truth for the error report instead. */
  def kmvJaccard(a: DataFrame, b: DataFrame, keyCol: String,
      k: Int = KmvK, seedBase: Int = HllSeedBase): DataFrame = {
    def bottom(df: DataFrame): DataFrame =
      df.select(col(keyCol).cast("long").as("k")).distinct()
        .select(col("k"), quadHash(col("k"), seedBase).as("h"))
        .orderBy("h", "k").limit(k)
    val ba = bottom(a).withColumn("in_a", lit(1L)).withColumn("in_b", lit(0L))
    val bb = bottom(b).withColumn("in_a", lit(0L)).withColumn("in_b", lit(1L))
    ba.unionByName(bb)
      .groupBy("h", "k")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
      .orderBy("h", "k").limit(k)
      .agg(count(lit(1)).as("k_used"), max("h").as("kth_hash"),
        sum(col("in_a") * col("in_b")).as("n_both"))
      .withColumn("jacc_bp", expr("n_both * 10000 DIV k_used"))
      .select("k_used", "kth_hash", "n_both", "jacc_bp")
  }

  /** Full set ALGEBRA from the same two coordinated bottom-k sketches
    * [[kmvJaccard]] reads: union size via the (k−1)·R/h_k estimator on
    * the merged sketch, then intersection and BOTH directed differences
    * as `est_union · fraction div k_used` — the fractions (n_both,
    * n_a_only, n_b_only) are EXACT on the coordinated sample by the
    * same rank-closure argument as the Jaccard flags ("what's new in
    * this snapshot vs the corpus", "how many keys did the feed drop"
    * answered from 2k sketch rows, never a co-shuffle of the distinct
    * sets). When the union has fewer than k distinct keys the sketch IS
    * the union and every estimate is exact. Same TakeOrdered plans, 2k
    * merge rows, bit-reproducible tie-breaks; estimates are integer (or
    * the kmv round-one-double-division discipline), so the whole
    * algebra hash-oracles. */
  def kmvSetOps(a: DataFrame, b: DataFrame, keyCol: String,
      k: Int = KmvK, seedBase: Int = HllSeedBase): DataFrame = {
    import graft.functions.Portable.{P1, P2}
    val numer = (k - 1).toDouble * (P1 * P2).toDouble
    def bottom(df: DataFrame): DataFrame =
      df.select(col(keyCol).cast("long").as("k")).distinct()
        .select(col("k"), quadHash(col("k"), seedBase).as("h"))
        .orderBy("h", "k").limit(k)
    val ba = bottom(a).withColumn("in_a", lit(1L)).withColumn("in_b", lit(0L))
    val bb = bottom(b).withColumn("in_a", lit(0L)).withColumn("in_b", lit(1L))
    ba.unionByName(bb)
      .groupBy("h", "k")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
      .orderBy("h", "k").limit(k)
      .agg(count(lit(1)).as("k_used"), max("h").as("kth_hash"),
        sum(expr("in_a * in_b")).as("n_both"),
        sum(expr("in_a * (1 - in_b)")).as("n_a_only"),
        sum(expr("(1 - in_a) * in_b")).as("n_b_only"))
      .withColumn("est_union",
        when(col("k_used") < k, col("k_used"))
          .otherwise(round(lit(numer) / col("kth_hash").cast("double"))
            .cast("long")))
      .withColumn("est_inter", expr("est_union * n_both div k_used"))
      .withColumn("est_diff_ab", expr("est_union * n_a_only div k_used"))
      .withColumn("est_diff_ba", expr("est_union * n_b_only div k_used"))
  }

  /** Seed offset for the AMS sign hashes (clear of the CMS/Bloom/HLL
    * coefficient ranges). */
  val AmsSeedBase = 900

  /** AMS (Alon–Matias–Szegedy) second-moment sketch: estimate
    * F₂ = Σ_k f(k)² — the SELF-join size of a key column, the number
    * the CMS inner product ([[graft.ops.Sketches]] join-size family)
    * needs about a table joined with itself, and the classic
    * repetition/skew statistic (F₂ ≫ n ⇒ heavy keys dominate).
    *
    * `groups · perGroup` sign counters X_j = Σ_rows s_j(key), with
    * s_j ∈ {−1, +1} = the parity of the [[quadHash]] quadratic
    * two-prime mix at seed pair (base+2j, base+2j+1) — coefficient
    * FORMULAS inlined with j as data so the oracle re-derives every
    * counter. The quadratic term matters: an AFFINE hash's parity
    * alternates along arithmetic-progression keys (h steps by a
    * constant odd a, so consecutive sequential keys cancel and X ≈ 0
    * — measured: est 3% of truth on 1..2000), exactly the key shape
    * id columns have; k² breaks the progression. E[X_j²] = F₂.
    * Estimator = median of `groups` floor-means of `perGroup` squares
    * — means in floor integers, the median via the dyadic ×2 trick
    * (sum of the two middle ranks), so every output is BIGINT. The
    * quadratic family is 2-wise-ish, not the textbook 4-wise;
    * accuracy is spec-gated empirically, not claimed from the theorem
    * — the honest-caveat discipline of the HLL small-range floor.
    *
    * Scale: the R-fold expansion happens inside codegen (explode of a
    * literal range, no data blowup past the partial agg — the shuffle
    * is R rows per partition), one R-row agg, one groups-row agg, and
    * an 8-value sort in a bounded collect_list. State is R counters
    * per shard forever — the sketch merges by addition across shards,
    * the agg-algebra property every sketch in this family exists for. */
  def amsF2(keys: DataFrame, keyCol: String, groups: Int = 8,
      perGroup: Int = 16, seedBase: Int = AmsSeedBase): DataFrame =
    amsEstimate(amsCounters(keys, keyCol, groups, perGroup, seedBase),
      groups, perGroup)

  /** The R = groups·perGroup sign counters (j, x) — the sketch STATE.
    * Pure sum-merge algebra: counters from shards/micro-batches ADD, so
    * this stage runs unchanged as a streaming aggregate (R rows of
    * state forever) — see `stream_ams_parity`. */
  def amsCounters(keys: DataFrame, keyCol: String, groups: Int = 8,
      perGroup: Int = 16, seedBase: Int = AmsSeedBase): DataFrame = {
    import graft.functions.Portable.{P1, P2, AMul, BMul}
    require(groups >= 1 && perGroup >= 1, "need positive grid dims")
    val r = groups * perGroup
    keys.select(col(keyCol).cast("long").as("k"))
      .select(col("k"),
        explode(sequence(lit(0L), lit((r - 1).toLong))).as("j"))
      .withColumn("i", col("j") * 2L + lit(seedBase.toLong))
      .withColumn("a1", expr(s"((2 * i + 1) * $AMul) % $P1"))
      .withColumn("b1", expr(s"((i + 1) * $BMul) % $P1"))
      .withColumn("a2", expr(s"((2 * (i + 1) + 1) * $AMul) % $P1"))
      .withColumn("b2", expr(s"((i + 2) * $BMul) % $P1"))
      .withColumn("h", expr(
        s"""(((k % $P1) * (k % $P1) % $P1) * a1 + (k % $P1) * b1) % $P1
           | * $P2
           | + (((k % $P2) * (k % $P2) % $P2) * a2 + (k % $P2) * b2) % $P2"""
          .stripMargin))
      .withColumn("s", lit(1L) - lit(2L) * expr("h % 2"))
      .groupBy("j").agg(sum("s").as("x"))
  }

  /** Median-of-floor-means estimate from a counter table. */
  def amsEstimate(counters: DataFrame, groups: Int = 8,
      perGroup: Int = 16): DataFrame =
    counters
      .withColumn("g", expr(s"j % $groups"))
      .groupBy("g").agg(expr(s"sum(x * x) div $perGroup").as("m"))
      .agg(array_sort(collect_list(col("m"))).as("ms"))
      .select((element_at(col("ms"), groups / 2)
        + element_at(col("ms"), groups / 2 + 1)).as("f2_est2"))

  /** Fixed-geometry equi-width histogram over a long column — the
    * mergeable quantile summary (bin counts ADD across shards, unlike
    * any exact rank). `lo`/`width`/`bins` are build-time constants;
    * values clamp into [0, bins). With power-of-two width the bucket
    * expression is one integer op, and every downstream estimate is
    * integer-exact — fully oracle-able, unlike GK/KLL whose state
    * depends on merge order. One partial-agg'd shuffle of ≤ bins rows
    * per map partition. */
  def histCounts(values: DataFrame, valCol: String, lo: Long,
      width: Long, bins: Int): DataFrame =
    histCountsBy(values, valCol, Nil, lo, width, bins)

  /** Per-GROUP histogram tables from one pass — groups·bins shuffle key
    * space, the same one-scan-many-sketches economics as
    * [[hllRegistersBy]]. */
  def histCountsBy(values: DataFrame, valCol: String,
      groupCols: Seq[String], lo: Long, width: Long, bins: Int): DataFrame =
    values
      .select(groupCols.map(col) :+ least(lit(bins - 1L), greatest(lit(0L),
        expr(s"(($valCol - $lo) div $width)"))).as("bucket"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** WEIGHTED histogram: each value contributes `wCol` (a non-negative
    * long) instead of 1 — the mass-quantile basis ("the doc length below
    * which half the TOKENS live", which at training time matters more
    * than the doc-count median: token mass is what fills batches).
    * Same fixed geometry, same mergeability; feed [[histQuantiles]]
    * unchanged — its covering-count selection then answers weighted
    * quantiles. */
  def histCountsWeighted(values: DataFrame, valCol: String, wCol: String,
      lo: Long, width: Long, bins: Int): DataFrame =
    values
      .select(least(lit(bins - 1L), greatest(lit(0L),
        expr(s"(($valCol - $lo) div $width)"))).as("bucket"),
        col(wCol).cast("long").as("__w"))
      .groupBy("bucket").agg(sum("__w").as("cnt"))

  /** Quantile estimates from a histogram: for each q (basis points) the
    * first bucket whose cumulative count covers q — estimate = the
    * bucket's inclusive upper edge, so error is bounded by bin width by
    * construction. Input bin rows are first re-summed per bucket, so a
    * UNION of shard histograms (or a sketch read back from disk) feeds in
    * directly — and the re-aggregate structurally bounds the cumulative
    * window's input to ≤ `bins` rows (the sketch, not the data), the
    * global-window-over-Aggregate-only contract PlanShapeSpec enforces
    * registry-wide. */
  def histQuantiles(hist: DataFrame, qBps: Seq[Int], lo: Long,
      width: Long, bins: Int): DataFrame =
    histQuantilesBy(hist, Nil, qBps, lo, width, bins)

  /** [[histQuantiles]] per group over a [[histCountsBy]] table: the
    * cumulative window partitions on the group columns, so each
    * partition is one group's ≤ `bins` sketch rows — bounded state per
    * task, arbitrarily many groups in parallel. */
  def histQuantilesBy(hist: DataFrame, groupCols: Seq[String],
      qBps: Seq[Int], lo: Long, width: Long, bins: Int): DataFrame = {
    val h = hist.groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(sum("cnt").as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy("bucket").rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = h.groupBy(groupCols.map(col): _*)
      .agg(sum("cnt").as("n_total"))
    val withCum = h.withColumn("cum", sum("cnt").over(w))
    val cum =
      if (groupCols.isEmpty) withCum.crossJoin(tot)
      else withCum.join(tot, groupCols)
    val qs = hist.sparkSession.range(1)
      .select(explode(array(qBps.map(q => lit(q.toLong)): _*)).as("q_bp"))
    qs.join(cum, cum("cum") * 10000L >= qs("q_bp") * cum("n_total"))
      .groupBy((groupCols :+ "q_bp").map(col): _*)
      .agg(min("bucket").as("bucket"), max("n_total").as("n_total"))
      .withColumn("est_upper",
        lit(lo) + (col("bucket") + 1L) * lit(width) - 1L)
      .select(groupCols.map(col)
        ++ Seq(col("q_bp"), col("bucket"), col("est_upper"),
          col("n_total")): _*)
      .orderBy((groupCols :+ "q_bp").map(col): _*)
  }

  /** Equi-join output-size estimate from two Count-Min tables of the
    * SAME geometry/seed: min over rows r of Σ_b cA(r,b)·cB(r,b) — the
    * CM inner-product bound (est ≥ |A ⋈ B|, overshoot ≤ N_A·N_B/width
    * per row w.h.p.). THE pre-flight cardinality check at 100 TB: the
    * planner-side answer to "can this join's output even be
    * materialized" from two KB summaries, no scan of either table.
    * Counter products cap at (N_A/row)·(N_B/row) per cell — width is
    * the overflow knob, documented at [[CmsWidth]]. */
  def cmsJoinSize(cA: DataFrame, cB: DataFrame): DataFrame =
    cA.withColumnRenamed("counter", "ca")
      .join(cB.withColumnRenamed("counter", "cb"), Seq("r", "bucket"))
      .groupBy("r").agg(sum(col("ca") * col("cb")).as("dot"))
      .agg(min("dot").as("join_size_est"))

  /** Build an m-bit Bloom filter over a long key column, returned as the
    * packed word array (mBits/64 longs). Distributed build: each key
    * explodes to k bit positions, bit-OR-aggregated per 64-bit word (one
    * partial-agg'd shuffle of ≤ mBits/64 rows per map partition), then
    * the FIXED-SIZE word table is collected — 8 KB at the default 2¹⁶
    * bits regardless of how many keys flowed in, the same bounded
    * driver-step contract as the BPE merge table
    * ([[TextAnalysis]]'s vocabulary-sized trainer step). */
  def bloomBuild(keys: DataFrame, keyCol: String, mBits: Int = 1 << 16,
      k: Int = 3, seedBase: Int = BloomSeedBase): Array[Long] = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64, got $mBits")
    val words = keys
      .select(explode(array((0 until k).map { r =>
        affineBucket(col(keyCol) % lit(Portable.P1), seedBase + r, mBits.toLong).as("b")
      }: _*)).as("bit"))
      .select((col("bit") / 64).cast("int").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))").as("mask"))
      .groupBy("word")
      .agg(expr("bit_or(mask)").as("bits"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership predicate against a built filter — a pure codegen'd
    * column over the literal word array (no join, no shuffle): all k bit
    * positions of `key` must be set. No false negatives; false-positive
    * rate ~(1 - e^(-k·n/m))^k. Meant to be pushed into the FACT SCAN as
    * a pre-filter, with an exact join downstream to kill the false
    * positives — the runtime-filter / semi-join-reduction shape where
    * the shuffle then carries only candidates. */
  def bloomMightContain(key: Column, words: Array[Long], mBits: Int = 1 << 16,
      k: Int = 3, seedBase: Int = BloomSeedBase): Column = {
    val arr = typedLit(words.toSeq)
    (0 until k).map { r =>
      val bit = affineBucket(key % lit(Portable.P1), seedBase + r, mBits.toLong)
      val word = element_at(arr, (bit / 64).cast("int") + 1)
      word.bitwiseAND(call_function("shiftleft", lit(1L), (bit % 64).cast("int"))) =!= 0L
    }.reduce(_ && _)
  }

  /** The composed reducer: keep exactly the `fact` rows whose `factKey`
    * appears in `dim`'s `dimKey`, pruning with the Bloom filter BEFORE
    * the exact semi join. Result is EXACT (the semi join removes the
    * filter's false positives; the filter has no false negatives), so a
    * plain semi-join oracle checks it — the Bloom pass only changes how
    * many rows reach the shuffle, which at 100 TB is the difference
    * between shuffling the fact table and shuffling ~selectivity of it. */
  def bloomPrunedSemiJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, mBits: Int = 1 << 16,
      k: Int = 3, seedBase: Int = BloomSeedBase): DataFrame = {
    val words = bloomBuild(dim.select(col(dimKey)), dimKey, mBits, k, seedBase)
    fact
      .where(bloomMightContain(col(factKey), words, mBits, k, seedBase))
      .join(dim.select(col(dimKey).as(factKey)).distinct(), Seq(factKey), "semi")
  }

  /** Bitmap-index distinct counting — EXACT count-distinct per group as
    * bitmap algebra (the roaring-bitmap posture every warehouse's
    * distinct-rollup engine runs): each 32-id block of the key space is
    * one long word (`word_idx = id div 32`, `bit = 1 << (id mod 32)`),
    * per-group words fold with `bit_or` (associative + commutative =
    * full map-side combine), and the distinct count is Σ popcount.
    *
    * The payoff over `count(distinct)` is the MERGE LAW: per-group word
    * tables union by another `bit_or` — no re-scan of the fact table —
    * which is how per-day bitmaps roll up to month/quarter distincts at
    * 100 TB. The law is demonstrated in-query: the '(all)' row is built
    * by merging the per-group words, NOT by re-counting, and an in-plan
    * assert pins every bitmap count to the exact `count(distinct)`
    * recomputed independently (so a popcount/shift regression fails the
    * DRIVER gate loudly, not just the spec).
    *
    * State is \|id-universe\|/32 longs per group — dense-id bitmaps,
    * the right tool while ids are dictionary-encoded ints (for sparse
    * universes the KMV/HLL family one file up is the fallback).
    * Requires ids ≥ 0 (asserted in-plan: a negative id would floor-div
    * into a foreign word and silently corrupt the popcount). */
  def bitmapDistinct(df: DataFrame, groupCol: String,
      idCol: String): DataFrame = {
    val ids = df.select(col(groupCol).as("g"),
      when(assert_true(col(idCol) >= 0,
          lit(s"bitmapDistinct: negative $idCol — dense-bitmap ids must " +
            "be >= 0; dictionary-encode first")).isNull,
        col(idCol).cast("long")).as("id"))
    val words = ids
      .select(col("g"), expr("id div 32").as("widx"),
        call_function("shiftleft", lit(1L),
          (col("id") % 32).cast("int")).as("bit"))
      .groupBy("g", "widx").agg(expr("bit_or(bit)").as("word"))
    val perGroup = words.groupBy("g")
      .agg(count(lit(1)).as("n_words"),
        sum(bit_count(col("word")).cast("long")).as("n_distinct"))
    // merge law: '(all)' from the words themselves (bit_or across
    // groups per word), never a re-scan of the input
    val merged = words.groupBy("widx").agg(expr("bit_or(word)").as("word"))
      .agg(count(lit(1)).as("n_words"),
        sum(bit_count(col("word")).cast("long")).as("n_distinct"))
      .select(lit("(all)").as("g"), col("n_words"), col("n_distinct"))
    val exact = ids.groupBy("g").agg(countDistinct("id").as("ex"))
      .unionByName(ids.agg(countDistinct("id").as("ex"))
        .select(lit("(all)").as("g"), col("ex")))
    perGroup.unionByName(merged)
      .join(exact, Seq("g"))
      .select(col("g"),
        when(assert_true(col("n_distinct") === col("ex"),
            lit("bitmapDistinct: popcount sum diverged from exact " +
              "count(distinct) — bitmap algebra regression")).isNull,
          col("n_words")).as("n_words"),
        col("n_distinct"))
      .orderBy("g")
  }
}
