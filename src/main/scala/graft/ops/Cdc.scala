package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC / merge-upsert application (EXT — SURVEY.md §2h; the maintenance
  * primitive of any continuously-updated 100 TB corpus: apply a batch of
  * inserts/updates/deletes onto a base snapshot, latest version wins).
  *
  * The reference has nothing like it (its corpus is a static CSV); a
  * training-data pipeline re-materializes its corpus from change feeds
  * constantly, and "MERGE INTO"-style apply is how.
  *
  * Formulation: union base (as inserts at version 0) with the change
  * rows, rank each key's rows by version descending, keep rank 1, drop
  * keys whose winning row is a delete. One hash shuffle by key; the
  * per-key window touches only that key's versions (bounded by feed
  * depth, not corpus size). This is exactly the distributed shape of
  * Delta/Iceberg MERGE without the table-format machinery.
  */
object Cdc {

  /** Apply `changes` (rows carrying `versionCol` and `opCol` ∈
    * {"I","U","D"}) onto `base` (treated as version-0 inserts; must not
    * already contain `versionCol`/`opCol`). Schemas must otherwise match
    * by name. Latest version per `key` wins; a winning "D" removes the
    * key. Ties within a version are broken by op descending ("U" > "I" >
    * "D" won't occur in a well-formed feed; the tie-break just keeps the
    * result deterministic). */
  def apply(base: DataFrame, changes: DataFrame, key: String,
      versionCol: String = "version", opCol: String = "op"): DataFrame = {
    require(!base.columns.contains(versionCol) && !base.columns.contains(opCol),
      s"base must not carry $versionCol/$opCol — they mark change rows")
    val tagged = base
      .withColumn(versionCol, lit(0L))
      .withColumn(opCol, lit("I"))
      .unionByName(changes)
    val w = Window.partitionBy(key)
      .orderBy(col(versionCol).desc, col(opCol).desc)
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "D")
      .drop("__rn", versionCol, opCol)
  }
}
