package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column profiling — the "describe my 100 TB table cheaply" operator a
  * training-data pipeline runs before anything else (EXT surface; the
  * reference's only profiling is a global count, SURVEY §2c A4).
  *
  * Exact profile: one narrow aggregate per column (count/nulls/distinct/
  * min/max/decimal-exact sum) — each scan is column-pruned to a single
  * column, and rows-per-result is exactly #columns. Distinct is the only
  * shuffle-heavy stat; at extreme scale swap `countDistinct` for
  * `approx_count_distinct` via the `approx` flag (HLL sketch, one pass,
  * no shuffle of distinct values — not oracle-able, so the registered
  * query keeps approx=false).
  */
object Profiler {

  def numericProfile(df: DataFrame, cols: Seq[String],
      approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "numericProfile requires at least one column")
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_non_null"),
        (if (approx) approx_count_distinct(col(c)) else countDistinct(col(c)))
          .as("n_distinct"),
        min(col(c)).cast("double").as("min_v"),
        max(col(c)).cast("double").as("max_v"),
        sum(col(c).cast(DecimalType(28, 2))).cast("double").as("sum_v"))
        .select(lit(c).as("column"), col("n_rows"), col("n_non_null"),
          col("n_distinct"), col("min_v"), col("max_v"), col("sum_v"))
    }.reduce(_.union(_)).orderBy("column")
  }
}
