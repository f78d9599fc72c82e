package graft.sources

import org.apache.spark.sql.SparkSession

/** Small-files compaction — the steady-state maintenance job of any
  * file-based 100 TB corpus: streaming ingestion and per-task writers
  * leave directories of KB-sized parquet files whose per-file open/footer
  * overhead eventually dominates scans. Compaction rewrites a directory
  * into ~`targetBytes` files.
  *
  * The file count is derived from the CURRENT on-disk byte size (one
  * driver-side listing — no data read), and the rewrite is one
  * `repartition(n)` pass: compaction IS a full rewrite by definition, so
  * the shuffle is the job, not overhead. Output rows are byte-identical
  * to input rows — only the file layout changes — which is what makes the
  * operation safely re-runnable and oracle-checkable.
  */
object Compaction {

  /** Number of ~`targetBytes` output files for the data under `path`.
    * Listing is RECURSIVE so partitioned layouts (`k=v/` subdirs) are
    * sized correctly, and finding zero data files is an error — a wrong
    * path must not silently plan a single-file full rewrite. */
  def plannedFiles(spark: SparkSession, path: String,
      targetBytes: Long): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, /* recursive = */ true)
    var total = 0L
    var nFiles = 0
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        total += f.getLen
        nFiles += 1
      }
    }
    require(nFiles > 0, s"no data files found under $path — nothing to compact")
    math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
  }

  /** Rewrite the parquet directory `inPath` as `outPath` with ~uniform
    * `targetBytes` files. Returns the file count written. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val n = plannedFiles(spark, inPath, targetBytes)
    spark.read.parquet(inPath).repartition(n)
      .write.mode("overwrite").parquet(outPath)
    n
  }
}
