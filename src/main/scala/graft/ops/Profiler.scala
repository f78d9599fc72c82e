package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column profiling — the "describe my 100 TB table cheaply" operator a
  * training-data pipeline runs before anything else (EXT surface; the
  * reference's only profiling is a global count, SURVEY §2c A4).
  *
  * Exact profile in ONE scan, unpivot-FIRST: rows are exploded to narrow
  * (column-index, value) pairs, deduplicated by a two-stage aggregate
  * keyed on the pair (map-side combine shrinks the shuffle to each
  * partition's local distincts), then one tiny #columns-group aggregate
  * derives count/nulls/distinct/min/max/decimal-exact sum — value
  * multiplicities ride along so the sum stays exact. The obvious
  * alternatives both lose: one aggregate per column re-scans the table N
  * times, and mixing N `countDistinct`s with plain aggs in ONE aggregate
  * plans an Expand keyed on (gid, every value column) with all ~6N
  * buffers live per entry — measured 20× slower than this shape at
  * sf0.1. With `approx` the dedup stage disappears entirely: distinct
  * counts come from a PORTABLE per-column KMV bottom-k sketch
  * ([[graft.functions.KmvBottomAgg]] over the quad-hash of the
  * 10⁶-scaled value) folded into the SAME single aggregate as the
  * plain stats — the map side ships ≤ k hash rows per (column,
  * partition), never the key stream. KMV is EXACT below k=256 distinct
  * values and ~6.3% rsd above — and unlike Spark's
  * `approx_count_distinct` (engine-private HLL++ encoding, which kept
  * profile_approx rows-only through round 10) every step replays in
  * DuckDB SQL, so the approx profile is hash-oracle'd end to end.
  * Portability contract of the scaled key: values must be non-negative
  * and ≤ ~9.2e12 (v·10⁶ inside signed-64) — asserted IN-PLAN, so a
  * column outside the envelope fails loudly in both engines instead of
  * hashing differently.
  *
  * The unpivot needs ONE common value type across columns; it is
  * DECIMAL(38,6), not double: a double basis silently merges distinct
  * 64-bit ids above 2^53 (e.g. this repo's own shingle hashes) and
  * de-exacts their sums, while decimal is exact for every integral and
  * money column at any magnitude. The documented limit is the other
  * direction: fractional digits beyond 6dp are not distinguished.
  */
object Profiler {

  /** `checkApprox`: when profiling with `approx`, ALSO run the exact
    * dedup stage and assert IN-PLAN that every column's KMV estimate
    * sits within ±`checkApprox` (relative) of the exact distinct count
    * — the recall-floor discipline that keeps the estimator honest at
    * scales the driver's hash oracle never sees. The bound should sit
    * ~4× over the KMV k=256 rsd of ~6.3% (estimates are EXACT below
    * 256 distinct values), so estimator jitter clears it while a real
    * regression (wrong column, broken sketch merge) does not. The
    * check pays for the exact pass it exists to avoid — it is a
    * TEST-SCALE gate; production profiling at 100 TB calls with
    * `checkApprox = None` and trusts the estimator's published error. */
  def numericProfile(df: DataFrame, cols: Seq[String],
      approx: Boolean = false,
      checkApprox: Option[Double] = None): DataFrame = {
    require(cols.nonEmpty, "numericProfile requires at least one column")
    val names = array(cols.map(lit(_)): _*)
    val pairs = df.select(posexplode(
      array(cols.map(c => col(c).cast(DecimalType(38, 6))): _*))
      .as(Seq("cidx", "v")))
    val perColumn =
      if (approx) {
        import graft.ops.Sketches.{HllSeedBase, KmvK}
        import graft.functions.Portable.{P1, P2}
        val numer = (KmvK - 1).toDouble * (P1 * P2).toDouble
        val kmv = udaf(new graft.functions.KmvBottomAgg(KmvK),
          org.apache.spark.sql.Encoders.LONG)
        val keyed = pairs
          .withColumn("kk",
            (col("v") * lit(1000000L)).cast(DecimalType(38, 0)).cast("long"))
          // scaled-key envelope gate: cast overflow nulls kk (DuckDB
          // errors on the same cast) and the quad-hash needs
          // non-negative keys — both misuses fail loudly here
          .where(assert_true(col("v").isNull ||
              (col("kk").isNotNull && col("kk") >= 0),
            concat(lit("portable approx profile requires values in "),
              lit("[0, ~9.2e12] (v*1e6 inside signed-64); got v="),
              col("v").cast("string"))).isNull)
          .withColumn("h", Sketches.quadHash(col("kk"), HllSeedBase))
        val prof = keyed.groupBy("cidx").agg(
            count(lit(1)).as("n_rows"),
            count(col("v")).as("n_non_null"),
            min("v").as("min_v"), max("v").as("max_v"),
            sum(col("v").cast(DecimalType(28, 2))).cast("double").as("sum_v"),
            kmv(col("h")).as("bh"))
          .withColumn("k_used", size(col("bh")).cast("long"))
          .withColumn("n_distinct",
            when(col("k_used") < KmvK, col("k_used"))
              .otherwise(round(lit(numer)
                / element_at(col("bh"), KmvK).cast("double")).cast("long")))
          .drop("bh", "k_used")
        checkApprox.fold(prof) { eps =>
          val exact = pairs.groupBy("cidx", "v")
            .agg(count(lit(1)).as("cnt"))
            .groupBy("cidx")
            .agg(count(when(col("v").isNotNull, lit(1))).as("exact_distinct"))
          prof.join(exact, "cidx")
            .where(assert_true(
              abs(col("n_distinct") - col("exact_distinct"))
                <= greatest(col("exact_distinct") * eps, lit(4.0d)),
              concat(lit("approx distinct drifted beyond the ±"),
                lit((eps * 100).toString), lit("% gate for column idx "),
                col("cidx").cast("string"), lit(": est "),
                col("n_distinct").cast("string"), lit(" vs exact "),
                col("exact_distinct").cast("string"))).isNull)
            .drop("exact_distinct")
        }
      } else {
        val dist = pairs.groupBy("cidx", "v").agg(count(lit(1)).as("cnt"))
        dist.groupBy("cidx").agg(
          sum("cnt").as("n_rows"),
          sum(when(col("v").isNotNull, col("cnt")).otherwise(lit(0L)))
            .as("n_non_null"),
          count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
          min("v").as("min_v"), max("v").as("max_v"),
          sum(col("v").cast(DecimalType(28, 2)) * col("cnt")).cast("double")
            .as("sum_v"))
      }
    perColumn
      .select(element_at(names, col("cidx") + 1).as("column"),
        col("n_rows"), col("n_non_null"), col("n_distinct"),
        col("min_v").cast("double").as("min_v"),
        col("max_v").cast("double").as("max_v"),
        col("sum_v"))
      .orderBy("column")
  }
}
