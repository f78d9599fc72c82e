package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink — the interchange format LLM text corpora
  * actually ship in (one JSON object per line, splittable, appendable).
  * The reference only reads/writes CSV; a corpus engine needs JSONL as a
  * first-class citizen.
  *
  * Reads always take an EXPLICIT schema: schema inference is a full
  * extra pass over the data (at 100 TB, a second scan before the first
  * real one) and silently widens types on dirty rows. With a declared
  * schema the read is single-pass, projection-pruned per line, and
  * malformed rows land in nulls (PERMISSIVE) instead of poisoning the
  * corpus.
  */
object Jsonl {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
