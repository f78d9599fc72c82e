package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver corpus (TESTDATA.md): one parquet file per table
  * under an sf dir (`/root/testdata/sf{0.001,0.01,0.1}`).
  *
  * Scale note: everything downstream relies on Catalyst pushing column
  * pruning and predicate pushdown into these parquet scans, so ops must
  * select/filter on the returned DataFrame lazily — never cache a wide
  * read. At cluster scale the same reader works over a partitioned
  * directory layout; nothing here assumes a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
