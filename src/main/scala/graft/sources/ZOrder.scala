package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering layout — the multi-dimensional
  * pruning technique for a 100 TB corpus queried on MORE than one
  * column. A single-column sort gives perfect file-level min/max
  * pruning on that column and NONE on any other (every file spans the
  * full range of the unsorted dimensions); interleaving the bits of two
  * bucketized columns into one Morton key and range-partitioning on it
  * gives every file a compact bounding box in BOTH dimensions, so
  * min/max file skipping works for filters on either column — the
  * trade documented in ZOrderSpec's measured file counts. (Same layout
  * idea Delta/Iceberg expose as OPTIMIZE ZORDER BY; here it is plain
  * parquet + a deterministic key, no table format needed.)
  *
  * The Morton key is a FLAT column expression (2·bits shift/mask
  * terms, whole-stage codegen'd — no UDF), and its arithmetic is
  * bit-reproducible in SQL, so the key itself is an oracle-checkable
  * surface (SparkEntry `zorder_key`).
  */
object ZOrder {

  /** Morton code of two non-negative integer columns, `bits` bits each:
    * bit i of x lands at position 2i, bit i of y at 2i+1. Inputs must
    * already lie in [0, 2^bits); use [[write]] for min/max bucketing of
    * raw columns. */
  def mortonKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` as parquet clustered on the Morton key of (xCol, yCol):
    * min/max scale both columns to [0, 2^bits) (one tiny driver agg —
    * the same collect-a-bound-then-broadcast shape as the StringIndexer
    * fit), range-partition into `numFiles` z-runs, sort within each,
    * drop the helper columns. Layout only — content and schema are
    * untouched, which is why the read-back query needs no special
    * oracle. */
  def write(df: DataFrame, path: String, xCol: String, yCol: String,
      bits: Int = 10, numFiles: Int = 16): Unit = {
    val r = df.agg(
      min(col(xCol).cast("double")), max(col(xCol).cast("double")),
      min(col(yCol).cast("double")), max(col(yCol).cast("double"))).head()
    require(!r.anyNull, s"z-order bounds: $xCol/$yCol are all-null")
    val (x0, x1, y0, y1) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val top = (1L << bits) - 1
    def bucket(c: Column, lo: Double, hi: Double): Column =
      if (hi == lo) lit(0L)
      else floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(top.toDouble))
        .cast("long")
    df.withColumn("__z",
        mortonKey(bucket(col(xCol), x0, x1), bucket(col(yCol), y0, y1), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
