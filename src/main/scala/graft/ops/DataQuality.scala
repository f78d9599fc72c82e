package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (EXT — the contract gate every
  * production ingest runs before data reaches training): a small rule
  * algebra (check predicates, uniqueness, referential integrity)
  * evaluated into one violations report.
  *
  * Execution shape is the 100 TB-relevant part: all CHECK and UNIQUE
  * rules on the same table fuse into ONE scan (conditional aggregates —
  * adding a rule costs a column, not a pass), and each FK rule is one
  * aggregated anti-join keyed on the FK — at scale the parent side is a
  * key-only projection, broadcast when small. Nothing here ever
  * materializes the violating rows themselves; pair with a filter on the
  * rule predicate to quarantine them (the [[graft.sources.Csv]]
  * malformed-policy convention).
  *
  * The report is data, not a crash: gate semantics (fail the pipeline)
  * belong to the caller via `assert_true` on n_violations, the
  * heavy-hitters fail-loudly contract.
  */
object DataQuality {

  sealed trait Rule { def table: String; def name: String }

  /** Violation = rows where `failCond` holds. NOT-NULL and range rules
    * are spellings of this (`col.isNull`, `col < lo || col > hi`). */
  final case class Check(table: String, label: String, failCond: Column)
      extends Rule {
    def name = s"check:$table.$label"
  }

  /** Violation count = rows carrying a duplicated non-null key value:
    * n_nonnull − n_distinct (0 iff the column is a key). */
  final case class Unique(table: String, col: String) extends Rule {
    def name = s"unique:$table.$col"
  }

  /** Violation = child rows (non-null FK) with no parent — counted via
    * aggregated anti-join. */
  final case class ForeignKey(table: String, col: String,
      refTable: String, refCol: String) extends Rule {
    def name = s"fk:$table.$col->$refTable.$refCol"
  }

  /** Evaluate `rules` against `tables`: one row per rule
    * `(rule, n_checked, n_violations)`, total-ordered by rule name.
    * Same-table Check/Unique rules share a single fused scan. */
  def report(tables: Map[String, DataFrame], rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    rules.foreach(r => require(tables.contains(r.table),
      s"rule ${r.name} references unknown table ${r.table}"))

    // fused per-table scan for Check + Unique
    val perTable = rules.collect {
      case c: Check => c.table -> c
      case u: Unique => u.table -> u
    }.groupBy(_._1).map { case (tbl, rs) =>
      val df = tables(tbl)
      val aggs = rs.map {
        case (_, c: Check) =>
          // coalesce: over an EMPTY table sum(when(...)) is NULL, which
          // would break the counts contract (and any n_violations = 0
          // gate) exactly when a DQ gate matters most — an empty ingest
          // batch has zero violations, not unknown violations
          coalesce(sum(when(c.failCond, 1L).otherwise(0L)), lit(0L))
            .as(c.name)
        case (_, u: Unique) =>
          (count(col(u.col)) - countDistinct(col(u.col))).as(u.name)
        case (_, r) => sys.error(s"unreachable: $r")
      }
      val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
      one.select(explode(array(rs.map { case (_, r) =>
        struct(lit(r.name).as("rule"), col("__n").as("n_checked"),
          col(s"`${r.name}`").as("n_violations"))
      }: _*)).as("e")).select("e.*")
    }

    // one aggregated anti-join per FK rule
    val fks = rules.collect { case fk: ForeignKey =>
      val child = tables(fk.table).select(col(fk.col).as("__k"))
        .filter(col("__k").isNotNull)
      val parent = tables(fk.refTable).select(col(fk.refCol).as("__k"))
      val orphans = child.join(parent, Seq("__k"), "left_anti")
        .agg(coalesce(count(lit(1)), lit(0L)).as("n_violations"))
      child.agg(count(lit(1)).as("n_checked")).crossJoin(orphans)
        .select(lit(fk.name).as("rule"), col("n_checked"),
          col("n_violations"))
    }

    (perTable ++ fks).reduce(_.unionByName(_)).orderBy("rule")
  }
}
