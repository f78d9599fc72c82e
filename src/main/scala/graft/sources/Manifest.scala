package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max data skipping WITHOUT a table format (EXT): the
  * mechanism behind Delta/Iceberg's stats-based pruning, surfaced as a
  * library op over plain parquet. Three pieces: cluster the data so
  * per-file value ranges are tight, keep a per-file (min, max, rows)
  * manifest, and answer band predicates by reading ONLY the files whose
  * range intersects — the planner never opens the skipped files, so a
  * 100 TB table answers a narrow time-band query at the cost of the
  * band, not the table.
  *
  * Complements the existing skipping surfaces: `sources/Partitioned`
  * prunes DIRECTORY-level (coarse, needs a partition column),
  * `sources/ZOrder` tightens multi-column locality; this is the
  * single-column file-granular form with an explicit, queryable
  * manifest (the observability piece — "how much would this predicate
  * skip" is itself answerable from the manifest).
  */
object Manifest {

  /** Stage `df` as `nFiles` range-clustered parquet files on
    * `clusterCol` — range partitioning is what makes per-file [min,max]
    * bands disjoint-ish and the manifest selective. Overwrites. */
  def stageClustered(df: DataFrame, dir: String, clusterCol: String,
      nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(clusterCol))
      .write.mode("overwrite").parquet(dir)

  /** Per-file stats manifest: (file, min_v, max_v, n_rows) — one
    * aggregation keyed by `input_file_name()`, #files rows total. In a
    * production loop this is written next to the data and maintained
    * incrementally per ingested file; here it is derived on demand. */
  def buildManifest(spark: SparkSession, dir: String,
      statCol: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(statCol)).as("min_v"), max(col(statCol)).as("max_v"),
        count(lit(1)).as("n_rows"))

  /** Files whose [min_v, max_v] intersects [lo, hi). */
  def qualifyingFiles(manifest: DataFrame, lo: Column, hi: Column): Array[String] =
    manifest.filter(col("max_v") >= lo && col("min_v") < hi)
      .select("file").collect().map(_.getString(0))

  /** Band read `statCol ∈ [lo, hi)` through the manifest: plan a scan
    * over ONLY the qualifying files, with the residual predicate applied
    * on top (boundary files straddle the band). The collected file list
    * is manifest-sized (#files, not #rows) — the same bounded
    * driver-step contract as a table format's log replay. Returns the
    * exact band, so a plain filter oracle checks it; the skipping shows
    * up as the scan's file count, asserted in SketchesSpec. */
  def prunedBandRead(spark: SparkSession, manifest: DataFrame, dir: String,
      statCol: String, lo: Column, hi: Column): DataFrame = {
    val files = qualifyingFiles(manifest, lo, hi)
    val src =
      if (files.isEmpty)
        spark.read.parquet(dir).limit(0) // empty band, keep the schema
      else spark.read.parquet(files.toIndexedSeq: _*)
    src.filter(col(statCol) >= lo && col(statCol) < hi)
  }
}
