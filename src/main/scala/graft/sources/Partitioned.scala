package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Hive-style partitioned parquet layout — the table layout a 100 TB
  * corpus actually lives in: `partitionBy` a low-cardinality column at
  * write time so every query filtering on it prunes whole directories at
  * planning time (`PartitionFilters` in the scan node, zero I/O for
  * non-matching partitions), instead of reading 100 TB to filter rows.
  *
  * The reference has no partitioned sink (its outputs are single CSV
  * files — SURVEY.md §2a S4); this is EXT scale surface like
  * [[Bucketed]]. Partition columns should be low-cardinality (≤ ~10k
  * directories): partitioning by a high-cardinality key creates a
  * small-files problem, not pruning.
  */
object Partitioned {

  /** Write `df` as parquet partitioned by `partCols`. No pre-shuffle: the
    * writer splits each task's output by partition value; callers that
    * need exactly-one-file-per-partition can repartition on the partition
    * columns first (a full shuffle — only worth it for final, published
    * tables). */
  def write(df: DataFrame, path: String, partCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)

  /** Scan a partitioned table pruned to one partition value. The filter
    * lands in the scan's PartitionFilters (asserted by PlanShapeSpec):
    * directories for other values are never listed, read, or decoded. */
  def readPruned(spark: SparkSession, path: String,
      partCol: String, value: String): DataFrame =
    spark.read.parquet(path).filter(col(partCol) === value)
}
