package graft.ops

import org.apache.spark.sql.DataFrame

/** Fan a few-file scan out to the session's full parallelism before
  * row-multiplying work (shingle/trigram explodes, iterative ML fits).
  *
  * Compact corpora arrive as one or two parquet files, so the scan —
  * and everything narrow-chained onto it, which for an explode can be
  * 1000x the input rows — runs on one core. Gate on the scan's FILE
  * count (plan inspection only — probing rdd.getNumPartitions would
  * force AQE to materialize every upstream stage of a derived input
  * just to read a number): few-or-no files → repartition (the shuffle
  * moves only the raw rows); many files means the scan is already
  * parallel (the real-scale case) → no-op. */
private[graft] object Spread {
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.inputFiles.length < target) df.repartition(target) else df
  }
}
