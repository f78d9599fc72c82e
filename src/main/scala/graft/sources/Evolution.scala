package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-evolution-tolerant parquet reading (EXT — the ingest reality
  * at 100 TB: a table's files span months of producer versions, and old
  * generations simply lack the columns added since).
  *
  * Mechanism: parquet `mergeSchema` unions the per-file footers (added
  * columns surface as NULL in pre-evolution files — Spark merges
  * FOOTERS, not data, so this costs one footer read per file, exactly
  * what a manifest-backed lakehouse does), then every evolved column is
  * back-filled with an explicit default. Partition-directory layout
  * (`gen=N`) keeps generation provenance as a partition column for free
  * — generation filters prune at the directory level.
  *
  * Policy note, stated rather than hidden: `coalesce(col, default)`
  * conflates "column absent in this generation" with "row null in a new
  * generation". That is the right call for a DEFAULT-valued evolution
  * (the SQL `ADD COLUMN ... DEFAULT` semantics this mirrors); producers
  * that need null-vs-absent distinguished must filter on the `gen`
  * partition column instead.
  */
object Evolution {

  /** Read a multi-generation parquet root with footer merging and apply
    * `defaults` to the evolved columns. */
  def readEvolved(spark: SparkSession, root: String,
      defaults: Map[String, Column]): DataFrame = {
    val df = spark.read.option("mergeSchema", "true").parquet(root)
    defaults.foldLeft(df) { case (d, (c, dflt)) =>
      d.withColumn(c, coalesce(col(c), dflt))
    }
  }
}
