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
}
