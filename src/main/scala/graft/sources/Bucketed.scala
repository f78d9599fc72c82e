package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed parquet tables — the shuffle-elimination primitive for
  * repeated big joins (SURVEY.md §7 M5; the reference has nothing like
  * it, its data fits one machine).
  *
  * Writing both sides of a recurring join bucketed (+sorted) by the join
  * key with the SAME bucket count makes every later equi-join on that key
  * co-located: the sort-merge join reads matching buckets directly and
  * the plan contains NO Exchange on either side — at 100 TB that is the
  * difference between a full-network shuffle per query and none. Verified
  * by the spec, which asserts the join plan is exchange-free.
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted parquet table in the session
    * catalog. Same `buckets` count on both join sides is required for
    * co-location. */
  def writeTable(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on `key` — planwise shuffle-free. */
  def join(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
