package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity resolution under the dedup family's
  * bounded-candidate contract (see [[Dedup]] — banded, capped, drops
  * reported; never all-pairs).
  *
  * Blocking is two-pass — a length-`prefixLen` name prefix and a
  * length-`suffixLen` name suffix — which makes recall a THEOREM for
  * single-edit corruption rather than a corpus accident: a single
  * character edit at position d leaves the prefix intact when
  * d > prefixLen and leaves the suffix intact when d <= n - suffixLen,
  * so with `prefixLen + suffixLen <= min name length` every possible
  * edit position preserves at least one of the two keys (the pigeonhole
  * split of PassJoin, Li et al. 2011, reduced to the one-edit case).
  * The round-5 single-pass 4-char-prefix block had FIXED key
  * cardinality on word-vocabulary names, so block sizes — hence
  * candidate pairs — grew O(N²/vocab) with NO bound and NO visibility.
  * Key cardinality is ultimately a corpus property (no fixed key scheme
  * can promise growth on a degenerate corpus), so the scale contract
  * here is the honest one: the suffix pass reaches the name's
  * discriminating tail (highest-cardinality region on id-suffixed
  * names), the explicit per-block cap bounds worst-case candidate
  * volume regardless of corpus shape, and [[blockStats]] makes a
  * binding cap (= a corpus whose keys collapsed) a reported number
  * instead of a silent quadratic.
  *
  * Scale shape: one row_number shuffle of (pass, key, name) width to
  * cap entity blocks, one broadcast join against the (small) query
  * side, candidate volume <= queries × 2 passes × `maxBlock`. The cap
  * is DETERMINISTIC (first `maxBlock` cand_keys per block in both
  * engines), so a capped run is still bit-reproducible and oracle-able;
  * dropped volume is a first-class surface ([[blockStats]]) exactly like
  * `dedup_cap_stats`, not a silent truncation. */
object EntityResolution {

  /** Entity side exploded to its two block keys, capped per block.
    * Input must carry (`cand_key`, `name`). */
  private def entityBlocks(entities: DataFrame, prefixLen: Int,
      suffixLen: Int): DataFrame =
    entities.select(lit("p").as("pass"),
        substring(col("name"), 1, prefixLen).as("blk"),
        col("cand_key"), col("name"))
      .unionAll(entities.select(lit("s").as("pass"),
        substring(col("name"), -suffixLen, suffixLen).as("blk"),
        col("cand_key"), col("name")))

  /** Candidate (query, entity) pairs from the two blocking passes.
    * `queries` carries (`q_key`, `dirty`); `entities` (`cand_key`,
    * `name`). Output: (q_key, cand_key, dirty, name), distinct. */
  def blockedCandidates(entities: DataFrame, queries: DataFrame,
      prefixLen: Int = 5, suffixLen: Int = 5,
      maxBlock: Int = 4096): DataFrame = {
    val wBlk = Window.partitionBy("pass", "blk").orderBy("cand_key")
    val ecap = entityBlocks(entities, prefixLen, suffixLen)
      .withColumn("rn", row_number().over(wBlk))
      .filter(col("rn") <= maxBlock).drop("rn")
    val qbl = queries.select(lit("p").as("pass"),
        substring(col("dirty"), 1, prefixLen).as("blk"),
        col("q_key"), col("dirty"))
      .unionAll(queries.select(lit("s").as("pass"),
        substring(col("dirty"), -suffixLen, suffixLen).as("blk"),
        col("q_key"), col("dirty")))
    ecap.join(broadcast(qbl), Seq("pass", "blk"))
      .select("q_key", "cand_key", "dirty", "name").distinct()
  }

  /** Blocked candidates scored with the codegen'd Jaro-Winkler kernel,
    * kept at `thresholdBp` on the ROUNDED basis-point score (so any
    * second engine cuts identically), total-ordered on the pair key. */
  def fuzzyMatch(entities: DataFrame, queries: DataFrame,
      thresholdBp: Int = 9000, prefixLen: Int = 5, suffixLen: Int = 5,
      maxBlock: Int = 4096): DataFrame =
    blockedCandidates(entities, queries, prefixLen, suffixLen, maxBlock)
      .withColumn("jw_bp",
        round(graft.functions.JaroWinkler(col("dirty"), col("name")) * 10000)
          .cast("long"))
      .filter(col("jw_bp") >= thresholdBp)
      .select("q_key", "cand_key", "jw_bp")
      .orderBy("q_key", "cand_key")

  /** Distributed exact global rank over (`name`, tie columns) — NO
    * single-partition window (the PlanShapeSpec rule): rows are sliced
    * by a 6-char ASCII prefix packed into a long (prefix packing is
    * monotone in the lexicographic order, so slice boundaries respect
    * it; 48 bits stays exact through approxQuantile's doubles), local
    * row_numbers run per slice in parallel, and a #slices-row broadcast
    * offset table lifts them to exact global ranks — the
    * [[Features.rangeNtileBucket]] construction adapted to string keys.
    * Ranks are identical to a plain `row_number() OVER (ORDER BY name,
    * ties)`, which is what lets a second engine recompute them. */
  private[graft] def globalRank(rows: DataFrame, tieCols: Seq[String],
      out: String = "rn"): DataFrame = {
    // Three passes over `rows` (quantile action, local window, counts)
    // — materialize once, the rangeNtileBucket/withRunningTotal
    // discipline.
    val rowsIn = rows.localCheckpoint()
    val packed = (1 to 6).foldLeft(lit(0L)) { (acc, i) =>
      acc * 256L + coalesce(ascii(substring(col("name"), i, 1)), lit(0)) }
    // base-256 packing is monotone vs lexicographic order ONLY while
    // every packed code point fits one byte; a prefix char ≥ U+0100
    // would silently mis-slice (wrong global ranks), so the Latin-1
    // assumption is enforced in-plan rather than assumed in the doc
    val prefixOk = coalesce(
      substring(col("name"), 1, 6).rlike("^[\\x00-\\xFF]*$"), lit(true))
    val withKey = rowsIn.withColumn("__pk",
      when(assert_true(prefixOk,
        lit("globalRank: name prefix contains a code point > 255 — " +
          "base-256 prefix packing breaks lexicographic monotonicity; " +
          "pre-normalize names or widen the packing")).isNull,
        packed).cast("double"))
    val spark = rows.sparkSession
    val parts = math.min(spark.sparkContext.defaultParallelism, 512)
    val cuts = withKey.stat
      .approxQuantile("__pk", (1 until parts).map(_.toDouble / parts).toArray, 0.001)
      .distinct.sorted
    val sliceId =
      if (cuts.isEmpty) lit(0)
      else size(filter(typedLit(cuts.toSeq), c => col("__pk") > c))
    val sliced = withKey.withColumn("__sid", sliceId)
    val wLocal = Window.partitionBy("__sid")
      .orderBy(col("name") +: tieCols.map(col): _*)
    val local = sliced.withColumn("__lrn",
      row_number().over(wLocal).cast("long"))
    val counts = sliced.groupBy("__sid").agg(count(lit(1)).as("__cnt"))
    val wOff = Window.orderBy("__sid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts
      .withColumn("__off", coalesce(sum("__cnt").over(wOff), lit(0L)))
      .select("__sid", "__off")
    local.join(broadcast(offs), Seq("__sid"))
      .withColumn(out, col("__off") + col("__lrn"))
      .drop("__pk", "__sid", "__lrn", "__off")
  }

  /** Sorted-neighborhood ER (Hernández & Stolfo 1995) — the OTHER
    * classic bounded-candidate blocking, orthogonal to
    * [[blockedCandidates]]' key passes: queries and entities merge into
    * ONE globally sorted list (by name string; side then id break
    * ties), and each query is compared only against entities within
    * `window` positions. Candidate volume is a HARD O(queries ×
    * 2·window) by construction — no cap needed, no degenerate corpus
    * can break it — at the price of heuristic recall: a corruption that
    * moves a name far in sort order escapes the window (on this corpus
    * a deletion inside the name stem jumps the whole same-stem suffix
    * block, so SN alone measures ~45% self-recall at sf0.01 where the
    * key passes prove 100%). That asymmetry is exactly why production
    * multi-pass ER runs BOTH families and unions candidates. The
    * neighbor probe is an EQUI-join on exploded rank offsets, never a
    * range join.
    * Output: (q_key, cand_key, jw_bp) at `thresholdBp`, total-ordered. */
  def sortedNeighborhood(entities: DataFrame, queries: DataFrame,
      window: Int = 10, thresholdBp: Int = 9000): DataFrame = {
    require(window >= 1, s"window >= 1, got $window")
    val unioned = entities.select(col("name"), lit("e").as("side"),
        col("cand_key").as("key"))
      .unionAll(queries.select(col("dirty").as("name"), lit("q").as("side"),
        col("q_key").as("key")))
    // ranked feeds both join sides: materialize once (eager
    // localCheckpoint — the containment/ingestGate lineage discipline)
    val ranked = globalRank(unioned, Seq("side", "key")).localCheckpoint()
    val ents = ranked.filter(col("side") === "e")
      .select(col("rn"), col("key").as("cand_key"), col("name"))
    val probes = ranked.filter(col("side") === "q")
      .select(col("key").as("q_key"), col("name").as("dirty"),
        explode(sequence(col("rn") - window, col("rn") + window)).as("rn"))
      .filter(col("rn") >= 1)
    probes.join(ents, "rn")
      .withColumn("jw_bp",
        round(graft.functions.JaroWinkler(col("dirty"), col("name")) * 10000)
          .cast("long"))
      .filter(col("jw_bp") >= thresholdBp)
      // (q_key, cand_key) pairs are unique by construction: every
      // entity holds exactly one rank, so no distinct pass is needed
      .select("q_key", "cand_key", "jw_bp")
      .orderBy("q_key", "cand_key")
  }

  /** Per-pass blocking health report — the `dedup_cap_stats` discipline:
    * block-key cardinality, entity volume, the largest block, and how
    * many entities the cap dropped. A capped run shows n_dropped > 0
    * here instead of silently shrinking recall. All integer counts →
    * fully oracle-able. */
  def blockStats(entities: DataFrame, prefixLen: Int = 5,
      suffixLen: Int = 5, maxBlock: Int = 4096): DataFrame =
    entityBlocks(entities, prefixLen, suffixLen)
      .groupBy("pass", "blk").agg(count(lit(1)).as("sz"))
      .groupBy("pass").agg(
        count(lit(1)).as("n_blocks"),
        sum("sz").as("n_entities"),
        max("sz").as("max_block"),
        sum(greatest(col("sz") - maxBlock, lit(0L))).as("n_dropped"))
      .orderBy("pass")

  /** SURVIVORSHIP — the step after matching/clustering that MDM calls
    * the golden record: per cluster, merge the member records into one
    * survivor by field-level rules rather than picking one row
    * wholesale (the best name and the best amount often live on
    * DIFFERENT members):
    *   - `name`: longest wins, ties to the lexicographically smallest
    *     (completeness proxy — truncated duplicates lose);
    *   - `amount`: max of the non-null values (nulls never overwrite
    *     data), with the null count surfaced (`n_null_amount` — how
    *     much of the cluster was missing the field matters to a data
    *     steward);
    *   - `category`: the cluster MODE, ties to the smallest value —
    *     deterministic by construction, like every argmax here (the
    *     labelProp min-struct tie-break, so the merged record
    *     hash-oracles).
    *
    * Scale shape: two cluster-keyed hash aggregates (the base rules in
    * one, the mode needs its own two-level agg) joined on the
    * \|clusters\|-sized key — no windows over the raw records, no
    * sorting of member lists. */
  def goldenRecords(records: DataFrame, clusterCol: String,
      nameCol: String, amountCol: String, catCol: String): DataFrame = {
    val base = records.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("n_members"),
        min(struct(negate(length(col(nameCol))).as("nl"),
          col(nameCol).as("v"))).getField("v").as("name"),
        max(col(amountCol)).as("amount"),
        sum(when(col(amountCol).isNull, 1L).otherwise(0L))
          .as("n_null_amount"))
    val mode = records.filter(col(catCol).isNotNull)
      .groupBy(col(clusterCol), col(catCol))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(clusterCol))
      .agg(min(struct(negate(col("cnt")).as("nc"), col(catCol).as("v")))
        .getField("v").as("category"))
    base.join(mode, Seq(clusterCol), "left")
      .select(col(clusterCol), col("n_members"), col("name"),
        col("amount"), col("n_null_amount"), col("category"))
      .orderBy(clusterCol)
  }
}
