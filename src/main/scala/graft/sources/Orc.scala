package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC source/sink — the second columnar format a lakehouse engine must
  * speak (Hive-era warehouses are ORC; migrations read ORC and write
  * parquet). The reference only does CSV (SURVEY.md §2a); this is EXT
  * surface like [[Jsonl]].
  *
  * Spark's native vectorized ORC reader gives the same scan properties
  * the engine relies on for parquet: column pruning, predicate pushdown
  * into stripe/row-group min-max indexes, and splittable stripes — so a
  * 100 TB ORC corpus scans with the same plan shape as parquet (asserted
  * for pushdown in PlanShapeSpec). Writes carry per-stripe column
  * statistics, which is what makes the read-side skipping work.
  */
object Orc {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Schema comes from the ORC footer (self-describing, no inference
    * pass — unlike JSONL there is no reason to declare it). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
