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
  * sf0.1. With `approx` the dedup stage disappears entirely
  * (`approx_count_distinct` HLL sketch, one narrow pass — not
  * oracle-able, so the registered query keeps approx=false).
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
    * dedup stage and assert IN-PLAN that every column's HLL estimate
    * sits within ±`checkApprox` (relative) of the exact distinct count
    * — the recall-floor discipline for a rows-only query (the driver
    * gate otherwise accepts any rows>0, so a broken sketch would pass
    * silently). The bound should sit ~5× over approx_count_distinct's
    * default 5% rsd, so estimator jitter clears it while a real
    * regression (wrong column, broken sketch merge) does not. The check pays for the exact pass
    * it exists to avoid — it is a TEST-SCALE gate; production profiling
    * at 100 TB calls with `checkApprox = None` and trusts the
    * estimator's published error. */
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
        val prof = pairs.groupBy("cidx").agg(
          count(lit(1)).as("n_rows"),
          count(col("v")).as("n_non_null"),
          approx_count_distinct(col("v")).as("n_distinct"),
          min("v").as("min_v"), max("v").as("max_v"),
          sum(col("v").cast(DecimalType(28, 2))).cast("double").as("sum_v"))
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
