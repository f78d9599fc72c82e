package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-level privacy audits (EXT — LLM-pipeline release gates).
  *
  * [[TextAnalysis.redactPii]] handles the per-document scrub; these are
  * the complementary TABLE-level checks a training-data release runs
  * before shipping: re-identification risk via k-anonymity (how many
  * rows sit in quasi-identifier groups smaller than k) and attribute
  * disclosure via l-diversity (groups where a sensitive column takes
  * fewer than l distinct values — everyone in the group leaks it).
  *
  * Scale shape: ONE hash aggregate over the quasi-identifier columns
  * computing group size and the sensitive column's exact distinct count
  * together, then a #groups-sized rollup — no self-joins, no windows,
  * partial aggregation map-side. At 100 TB the QI cardinality (not the
  * row count) bounds reducer state, exactly like any groupBy report.
  * All outputs are counts and integer basis points ⇒ hash-oracle'd.
  */
object Privacy {

  /** Per-QI-group audit rows: group size (the k of every member) and
    * the sensitive column's distinct count (the l), flagged against the
    * requested thresholds. Only flagged groups are returned — at scale
    * the violating tail is the actionable (and small) output, the
    * compliant bulk is not. */
  def kAnonymityGroups(df: DataFrame, qi: Seq[String], sensitive: String,
      k: Int = 5, l: Int = 2): DataFrame =
    df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("group_n"),
        countDistinct(col(sensitive)).as("l_distinct"))
      .filter(col("group_n") < k || col("l_distinct") < l)
      .select(qi.map(col) :+ col("group_n") :+ col("l_distinct") :+
        (col("group_n") < k).as("k_violation") :+
        (col("l_distinct") < l).as("l_violation"): _*)
      .orderBy(qi.map(col): _*)

  /** One-row release-gate summary: total rows, QI-group count, rows in
    * k-violating groups (= rows that would need suppression or
    * generalization), rows in l-violating groups, the dataset's actual
    * min-k and min-l, and the suppression rate in integer bp. The
    * consumer gates on `suppress_bp` or asserts `min_k >= k`. */
  def kAnonymityReport(df: DataFrame, qi: Seq[String], sensitive: String,
      k: Int = 5, l: Int = 2): DataFrame = {
    val groups = df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("group_n"),
        countDistinct(col(sensitive)).as("l_distinct"))
    groups.agg(
      sum(col("group_n")).as("n_rows"),
      count(lit(1)).as("n_groups"),
      coalesce(sum(when(col("group_n") < k, col("group_n"))), lit(0L))
        .as("rows_k_violating"),
      coalesce(sum(when(col("l_distinct") < l, col("group_n"))), lit(0L))
        .as("rows_l_violating"),
      min(col("group_n")).as("min_k"),
      min(col("l_distinct")).as("min_l"))
    .select(col("n_rows"), col("n_groups"), col("rows_k_violating"),
      col("rows_l_violating"), col("min_k"), col("min_l"),
      // empty release candidate ⇒ n_rows is NULL (sum over zero groups)
      // and an all-NULL report could be misread as "no violations" by a
      // gate that only checks suppress_bp — assert_true(NULL) throws, so
      // an empty input fails loudly instead
      when(assert_true(col("n_rows") > 0,
        lit("kAnonymityReport: empty release candidate — nothing to " +
          "audit; refusing to emit a NULL report that a release gate " +
          "could misread as pass")).isNull,
        expr("rows_k_violating * 10000 div n_rows")).as("suppress_bp"))
  }

  /** APPLY the k-anonymity/l-diversity policy the audits report on:
    * return only the rows whose QI group satisfies both thresholds —
    * the suppression release itself, not the report about it. The
    * complement of [[kAnonymityGroups]]' violating tail by
    * construction: one hash aggregate over the QI produces the
    * compliant-group keys, one semi-join (broadcast when the compliant
    * key set is small, shuffle otherwise — Catalyst's call) filters the
    * release. Row identity is preserved — no projection, so the caller
    * chains generalization or [[dpCounts]] on top. */
  def kAnonymitySuppress(df: DataFrame, qi: Seq[String], sensitive: String,
      k: Int = 5, l: Int = 2): DataFrame = {
    val ok = df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("group_n"),
        countDistinct(col(sensitive)).as("l_distinct"))
      .filter(col("group_n") >= k && col("l_distinct") >= l)
      .select(qi.map(col): _*)
    df.join(ok, qi, "left_semi")
  }

  /** Differentially-private count release via the GEOMETRIC MECHANISM
    * (Ghosh-Roughgarden-Sundararajan 2009): per-group counts perturbed
    * by discrete-Laplace noise Z = G₁ − G₂, the difference of two iid
    * Geometric(1/2) draws, giving P(Z = z) ∝ α^|z| with α = 1/2 —
    * ε = ln 2 per released count at sensitivity 1 (`eps_bp` = 6931
    * stamps each row with its budget spend ×10⁴).
    *
    * Sampling is INTEGER-ONLY and portable: two seeded affine hashes of
    * the group key give near-uniform values in [0, P1), and
    * trailing-ones(h) = bit_count((h XOR (h+1)) >> 1) is a perfect
    * Geometric(1/2) draw on uniform bits — no float inverse-CDF, no
    * log, identical in Spark and DuckDB bit arithmetic, which is what
    * lets the whole MECHANISM be hash-oracle-checked end to end.
    *
    * LOUD CAVEAT (by design, the seeded-ML stance of this repo): noise
    * derived deterministically from the group key is NOT differential
    * privacy — an adversary who knows the key recomputes the noise.
    * This surface verifies mechanism SHAPE (per-row budget accounting,
    * noise distribution, release arithmetic); production swaps the two
    * hash draws for a secure RNG and keeps every other line. Released
    * counts are clamped at 0 (counts are non-negative; clamping is
    * post-processing — DP holds through it).
    *
    * Scale: one hash aggregate + a map-only noise projection; nothing
    * but (key, count) shuffles. */
  def dpCounts(df: DataFrame, key: String, magIdx: Int = 17,
      signIdx: Int = 18): DataFrame = {
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n_true"))
      .withColumn("noise",
        discreteLaplace(col(key), magIdx, signIdx))
      .withColumn("released", greatest(col("n_true") + col("noise"), lit(0L)))
      .withColumn("eps_bp", lit(6931L))
      .orderBy(key)
  }

  /** DP SUM release — the geometric mechanism at bounded sensitivity:
    * per-row contributions are CLAMPED to [0, clampMax] (the standard
    * contribution bound; without it one row could move the sum
    * arbitrarily and no finite ε exists), the clamped sum is rounded to
    * clampMax granularity, and discrete-Laplace noise is added IN THOSE
    * UNITS — support on multiples of the sensitivity is what keeps the
    * ε = ln 2 ratio bound airtight (unit-scale noise under a
    * sensitivity-C statistic is the classic granularity hole: a shift
    * smaller than C has unbounded likelihood ratio). Same integer
    * trailing-ones sampler and the same LOUD seeded-noise caveat as
    * [[dpCounts]]. Output: true row count, clamped exact sum, released
    * sum (clampMax-granular, ≥ 0), eps_bp stamp. */
  def dpSums(df: DataFrame, key: String, value: Column, clampMax: Long,
      magIdx: Int = 19, signIdx: Int = 20): DataFrame = {
    require(clampMax >= 1, s"clampMax >= 1, got $clampMax")
    df.select(col(key), value.cast("long").as("__v"))
      .withColumn("__c", greatest(least(col("__v"), lit(clampMax)), lit(0L)))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_true"), sum("__c").as("sum_clamped"))
      .withColumn("__units",
        expr(s"(sum_clamped + ${clampMax / 2}) div $clampMax"))
      .withColumn("noise_units",
        discreteLaplace(col(key), magIdx, signIdx))
      .withColumn("released",
        greatest((col("__units") + col("noise_units")) * lit(clampMax),
          lit(0L)))
      .withColumn("eps_bp", lit(6931L))
      .select(key, "n_true", "sum_clamped", "noise_units", "released",
        "eps_bp")
      .orderBy(key)
  }

  /** GENERALIZATION ladder — the knob a release turns BEFORE
    * suppressing rows: coarsen the numeric quasi-identifier through
    * exponentially wider buckets (width·10ˡ) and report, per level, the
    * k-anonymity landscape (groups, violating rows, min-k/min-l,
    * suppression cost in bp) plus which level is the CHEAPEST that fits
    * the suppression budget — generalize until suppression is
    * affordable, the standard Mondrian-style trade-off made a
    * driver-checked table. `chosen_level` = −1 on every row when no
    * level fits (the ladder ran out — fail the release, don't round
    * down silently).
    *
    * Scale: one QI hash agg per level (levels ≪ 10, fused scans per
    * level) + a 1-row broadcast argmin. All integer. */
  def generalizationLadder(df: DataFrame, qiFixed: Seq[String],
      numCol: String, sensitive: String, k: Int = 5, l: Int = 2,
      levels: Int = 4, baseWidth: Long = 1000L,
      budgetBp: Long = 500L): DataFrame = {
    require(levels >= 1 && baseWidth >= 1)
    val perLevel = (0 until levels).map { lv =>
      val width = baseWidth * math.pow(10, lv).toLong
      df.withColumn("__b",
          expr(s"CAST(floor($numCol / $width) AS BIGINT)"))
        .groupBy((qiFixed :+ "__b").map(col): _*)
        .agg(count(lit(1)).as("group_n"),
          countDistinct(col(sensitive)).as("l_distinct"))
        .agg(lit(lv.toLong).as("level"),
          count(lit(1)).as("n_groups"),
          sum("group_n").as("n_rows"),
          coalesce(sum(when(col("group_n") < k, col("group_n"))),
            lit(0L)).as("rows_k_violating"),
          min("group_n").as("min_k"),
          min("l_distinct").as("min_l"))
        .withColumn("suppress_bp",
          expr("rows_k_violating * 10000 div n_rows"))
    }.reduce(_.unionByName(_))
    val chosen = perLevel.filter(col("suppress_bp") <= budgetBp)
      .agg(coalesce(min("level"), lit(-1L)).as("chosen_level"))
    perLevel.crossJoin(broadcast(chosen))
      .withColumn("chosen", col("level") === col("chosen_level"))
      .select("level", "n_groups", "n_rows", "rows_k_violating",
        "min_k", "min_l", "suppress_bp", "chosen_level", "chosen")
      .orderBy("level")
  }

  /** t-closeness audit (Li-Li-Venkatasubramanian 2007) — the third rung
    * of the release-gate ladder after k-anonymity and l-diversity:
    * l-diversity only counts DISTINCT sensitive values per QI group, so
    * a group that is 99% one diagnosis with a token second value passes
    * l=2 while still leaking. t-closeness instead bounds the DISTANCE
    * between each group's sensitive-value distribution and the global
    * one; here that distance is total variation over floor-bp-quantized
    * shares (`t_bp = Σ_s |p_g(s)−q(s)| div 2`, in [0, 10000]) — the
    * categorical-attribute form of the paper's metric, chosen over
    * EMD/KL for the same reason [[DataQuality.distributionDrift]] picks
    * TVD: integer arithmetic end to end, so the gate number itself
    * hash-oracles. Absent (group, value) cells count as p=0 — the full
    * sensitive domain is scored for every group, not just the values
    * the group happens to contain.
    *
    * Output: the topK WORST groups (highest t_bp) with their sizes —
    * the review queue, biggest leak first. Gate semantics belong to the
    * caller (`assert_true(max t_bp <= t)`), the family convention.
    *
    * Scale shape: one (QI × sensitive) hash agg, one QI rollup, and a
    * \|domain\|-row broadcast blown onto the #groups-sized table — the
    * fact table is scanned twice (cells + domain), never joined to
    * itself; reducer state is #groups·\|domain\|, bounded by the QI and
    * sensitive cardinalities, not the row count. */
  def tClosenessReport(df: DataFrame, qi: Seq[String], sensitive: String,
      topK: Int = 20): DataFrame = {
    val qiCols = qi.map(col)
    val cell = df.groupBy(qiCols :+ col(sensitive): _*)
      .agg(count(lit(1)).as("n_gs"))
    val grp = cell.groupBy(qiCols: _*).agg(sum("n_gs").as("n_group"))
    val dom = df.groupBy(col(sensitive)).agg(count(lit(1)).as("n_s"))
    val tot = df.agg(count(lit(1)).as("n_tot"))
    grp.crossJoin(broadcast(dom.crossJoin(tot)))
      .join(cell, qi :+ sensitive, "left")
      .withColumn("p_bp",
        expr("coalesce(n_gs, 0) * 10000 div n_group"))
      .withColumn("q_bp", expr("n_s * 10000 div n_tot"))
      .groupBy(qiCols: _*)
      .agg(max("n_group").as("n_group"),
        expr("sum(abs(p_bp - q_bp)) div 2").as("t_bp"))
      .orderBy(desc("t_bp") +: qiCols.map(_.asc): _*)
      .limit(topK)
  }

  /** Shared discrete-Laplace draw (difference of two Geometric(1/2)
    * trailing-ones samples over seeded affine hashes of the group key —
    * see [[dpCounts]] for the construction and the seeded caveat). */
  private def discreteLaplace(key: Column, magIdx: Int,
      signIdx: Int): Column = {
    import graft.functions.Portable.{P1, aCoef, bCoef}
    def affine(i: Int): Column =
      (key.cast("long") % lit(P1) * lit(aCoef(i)) + lit(bCoef(i))) % lit(P1)
    def trailingOnes(h: Column): Column =
      (bit_count(h.bitwiseXOR(h + lit(1L))) - lit(1)).cast("long")
    trailingOnes(affine(magIdx)) - trailingOnes(affine(signIdx))
  }
}
