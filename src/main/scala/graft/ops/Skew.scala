package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §7 M5). AQE's skew-join split handles
  * sort-merge skew automatically (on in GraftSession); this operator is
  * the explicit fallback for the case AQE can't fix: a shuffled hash/SMJ
  * equi-join where a handful of hot keys put one partition orders of
  * magnitude above the rest and the non-skewed side is too big to
  * broadcast outright.
  *
  * `saltedJoin` splits every hot key's fact rows across `salt` partitions
  * (random-uniform salt on the fact side) and replicates the matching
  * right-side rows to all `salt` buckets (explode — right side must be
  * the smaller one). Join semantics are exactly the plain equi-join's:
  * the salt column only refines the partitioning, never the match.
  */
object Skew {

  /** Key-skew DIAGNOSIS — the report that decides whether a join needs
    * [[saltedJoin]]/AQE skew handling before anyone pays for it: the
    * top-`topK` heaviest keys with their load shares, plus two
    * whole-distribution statistics riding on every row — `max_share_bp`
    * (the single worst key's share: the partition that will straggle)
    * and the exact GINI coefficient of the key-load distribution in bp
    * (0 = perfectly even, →10000 = one key owns everything).
    *
    * Gini is computed EXACTLY from the sorted-rank identity
    * `G = (2·Σ rankᵢ·cntᵢ − (n+1)·N) / (n·N)` with ranks assigned
    * distributed ([[Features.withRunningTotal]] over a packed
    * (cnt, key) composite — the curriculumSchedule packing discipline,
    * key width asserted IN-PLAN), so the skew number itself
    * hash-oracles. Σrank·cnt stays under signed-64 while n·N < 9·10¹⁸
    * — beyond that the report is DECIMAL territory, documented not
    * silent (assert rides the same guard).
    *
    * Scale: one hash agg to the \|keys\|-sized load table, one
    * distributed rank pass over it, two 1-row broadcasts, TakeOrdered.
    * The fact table is scanned once. */
  def keySkewReport(df: DataFrame, key: String,
      topK: Int = 10): DataFrame = {
    val counts = df.groupBy(col(key).cast("long").as("k"))
      .agg(count(lit(1)).as("cnt"))
    val packed = counts.withColumn("__ord",
      when(assert_true(col("k") >= 0 && col("k") < lit(10000000000L) &&
          col("cnt") < lit(900000000L),
        lit("keySkewReport: key outside [0, 1e10) or a key heavier " +
          "than 9e8 rows overflows the packed rank key — widen to " +
          "DECIMAL before trusting this report")).isNull,
        col("cnt") * lit(10000000000L) + col("k")))
      .withColumn("__one", lit(1L))
    val ranked = Features.withRunningTotal(packed, "__ord", "__one",
      "rank")
    val tot = ranked.agg(count(lit(1)).as("n_keys"),
      sum("cnt").as("n_rows"),
      sum(expr("rank * cnt")).as("rank_mass"),
      max("cnt").as("max_cnt"))
    val summary = tot
      .withColumn("gini_bp", expr(
        "(2 * rank_mass - (n_keys + 1) * n_rows) * 10000" +
          " div (n_keys * n_rows)"))
      .withColumn("max_share_bp", expr("max_cnt * 10000 div n_rows"))
      .select("n_keys", "n_rows", "gini_bp", "max_share_bp")
    ranked.crossJoin(broadcast(summary))
      .withColumn("share_bp", expr("cnt * 10000 div n_rows"))
      .select(col("k").as(key), col("cnt"), col("share_bp"),
        col("n_keys"), col("n_rows"), col("gini_bp"),
        col("max_share_bp"))
      .orderBy(desc("cnt"), asc(key))
      .limit(topK)
  }

  /** Equi-join `left ⋈ right` on `key` with left-side salting. `salt`
    * should be ≥ the worst observed key-partition imbalance factor.
    * Right side grows ×salt (keep it the dimension side). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt > 0)
    // random-uniform salt: any assignment is correct (it only spreads
    // rows), so no determinism requirement; rand() is cheap and even.
    val saltedLeft = left.withColumn(
      "__salt", (rand(42) * salt).cast("int"))
    val saltedRight = right.withColumn(
      "__salt", explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }
}
