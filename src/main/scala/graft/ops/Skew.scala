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
