package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a pure function (SparkSession, sfDir) =>
  * DataFrame over the driver corpus (TESTDATA.md). Entries with a DuckDB
  * twin in [[oracleSql]] are hash-compared by the driver at sf0.01; the
  * rest get a rows>0 check. All oracle'd queries end in a total order and
  * use exact types (BIGINT counts, DECIMAL-exact sums surfaced as double)
  * so the compare is deterministic (SURVEY.md §7 "hard parts").
  */
object SparkEntry extends SparkEntryOracles3 {
  /** One entry per implemented operator from SURVEY.md §2 (merged from
    * the per-family registry traits — the round-12 mechanical split of
    * the former 11 kLoC single file). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queriesChunk1 ++ queriesChunk2 ++ queriesChunk3

  def oracleSql: Map[String, String] =
    oracleChunk1 ++ oracleChunk2 ++ oracleChunk3
}
