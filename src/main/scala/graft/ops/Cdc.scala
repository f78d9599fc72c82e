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

  /** Snapshot diff — the inverse of [[apply]]: given two materializations
    * of the same table, emit the change feed that turns `a` into `b`
    * ('A' added, 'D' deleted, 'U' changed on any compared column;
    * unchanged keys are dropped, which is what makes the output feed-
    * sized, not table-sized). The audit/regression primitive for corpus
    * re-materializations: "what did this pipeline change?".
    *
    * One full-outer hash join on `key` — a single co-partitioned shuffle
    * of both snapshots; the column compare is null-safe (`<=>`) per
    * column, map-side after the join. Output carries old/new values for
    * every compared column. Intermediate columns use a reserved `__sd_`
    * prefix so input columns named `k`/`change` (or already `a_`/`b_`
    * prefixed) cannot collide with the working set. */
  def snapshotDiff(a: DataFrame, b: DataFrame, key: String,
      compare: Seq[String]): DataFrame = {
    require(compare.nonEmpty, "snapshotDiff needs at least one compare column")
    val all = key +: compare
    require(!all.exists(_.startsWith("__sd_")),
      "snapshotDiff reserves the __sd_ column prefix")
    // the verdict column is named `change`; a KEY of that name would make
    // the output carry two `change` columns and break the final sort
    // (compare columns are fine — they surface as old_/new_ prefixed)
    require(key != "change",
      "snapshotDiff reserves the output column name `change` for the verdict")
    val left = a.select(all.map(c => col(c).as(s"__sd_a_$c")): _*)
    val right = b.select(all.map(c => col(c).as(s"__sd_b_$c")): _*)
    val changed = compare
      .map(c => !(col(s"__sd_a_$c") <=> col(s"__sd_b_$c")))
      .reduce(_ || _)
    val outCols = col("__sd_key").as(key) +: col("__sd_change").as("change") +:
      compare.flatMap(c =>
        Seq(col(s"__sd_a_$c").as(s"old_$c"), col(s"__sd_b_$c").as(s"new_$c")))
    left.join(right, col(s"__sd_a_$key") === col(s"__sd_b_$key"), "full")
      .withColumn("__sd_key", coalesce(col(s"__sd_a_$key"), col(s"__sd_b_$key")))
      .withColumn("__sd_change",
        when(col(s"__sd_a_$key").isNull, lit("A"))
          .when(col(s"__sd_b_$key").isNull, lit("D"))
          .when(changed, lit("U")))
      .filter(col("__sd_change").isNotNull)
      .select(outCols: _*)
      .orderBy(key)
  }

  /** Type-2 slowly-changing dimension build from a change feed: collapse
    * consecutive runs of the same attribute value per key, then stamp each
    * run with [valid_from, valid_to) and an is_current flag — the
    * warehouse primitive for "what was this entity's state at time t".
    *
    * `seq` must be a unique tie-breaker within (key, orderUs) so the
    * result is deterministic even with simultaneous changes.
    *
    * Scale: both windows share (partitionBy(key), orderBy(orderUs, seq))
    * and the run-start filter preserves sort order, so the whole build is
    * ONE hash shuffle by key; per-key state is bounded by that key's
    * change count, not corpus size. */
  def scd2(feed: DataFrame, key: String, attr: String, orderUs: String,
      seq: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(orderUs), col(seq))
    feed
      .select(col(key), col(seq), col(attr), col(orderUs))
      .withColumn("__prev", lag(col(attr), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      // run starts: first row per key, or attribute changed (null-safe)
      .filter(col("__rn") === 1 || !(col(attr) <=> col("__prev")))
      .withColumn("valid_to_us", lead(col(orderUs), 1).over(w))
      .select(col(key), col(seq), col(attr),
        col(orderUs).as("valid_from_us"),
        col("valid_to_us"),
        col("valid_to_us").isNull.cast("long").as("is_current"))
      .orderBy(col(key), col("valid_from_us"), col(seq))
  }

  /** Temporal (as-of-validity) dimension join — the consumer side of
    * [[scd2]]: each fact row joins the version whose
    * `[valid_from_us, valid_to_us)` half-open window contains the fact
    * time (`valid_to_us IS NULL` = the open current version). THE
    * lakehouse pattern for "what was this entity's state when the event
    * happened" — joining the dimension's current snapshot instead
    * silently rewrites history.
    *
    * Plan shape is the scale argument: the key equality is the join
    * condition, so this is an ordinary hash/sort-merge join shuffled on
    * `key`, with the validity window as a RESIDUAL filter — never a
    * range-only (nested-loop) join. Per fact at most one version
    * matches (windows within a key partition the timeline — [[scd2]]
    * guarantees non-overlap by construction). */
  def temporalJoin(facts: DataFrame, versions: DataFrame, key: String,
      factUs: String): DataFrame = {
    val d = versions.withColumnRenamed(key, "__vk")
    facts.join(d,
        facts(key) === d("__vk") &&
          col(factUs) >= col("valid_from_us") &&
          (col("valid_to_us").isNull || col(factUs) < col("valid_to_us")))
      .drop("__vk")
  }

  /** Incremental materialized-view maintenance for self-maintainable
    * aggregates: merge any number of PARTIALLY AGGREGATED state tables
    * (the standing view + each new delta batch's partial agg) into the
    * view that a full recompute over base ∪ deltas would produce —
    * without ever rescanning base. Merge rules are by column-name
    * convention, the same algebra Spark's own partial/final
    * HashAggregate uses internally, surfaced as a library op:
    * `cnt`/`sum_*` re-SUM, `min_*` re-MIN, `max_*` re-MAX (all
    * decomposable aggregates; AVG is derived downstream as sum/cnt,
    * never merged directly — the classic non-decomposable trap).
    *
    * The 100 TB argument IS this op: refreshing a corpus-wide stats view
    * costs O(|delta| + |view|) instead of O(|base|), so per-view cells
    * (not per-event rows) cross the one shuffle. Insert-only deltas
    * only — MIN/MAX are not maintainable under deletes (a delete of the
    * current extremum needs the base rescan this op exists to avoid;
    * route deletes through [[apply]] + recompute instead). */
  def mergeAggState(key: Seq[String], parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "need at least one state table")
    val all = parts.reduce(_.unionByName(_))
    val aggs = all.columns.filterNot(key.contains).toSeq.map { c =>
      if (c == "cnt" || c.startsWith("sum_")) sum(col(c)).as(c)
      else if (c.startsWith("min_")) min(col(c)).as(c)
      else if (c.startsWith("max_")) max(col(c)).as(c)
      else throw new IllegalArgumentException(
        s"no merge rule for column '$c' — name it cnt/sum_*/min_*/max_* " +
          "or drop it from the state tables")
    }
    all.groupBy(key.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Incremental maintenance of a JOIN view under insert-only deltas —
    * the other classic IVM identity next to [[mergeAggState]]'s
    * decomposable aggregates:
    *
    *   Δ(A ⋈ B) = ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
    *
    * with A, B the PRE-delta states (using post-delta states on either
    * side double-counts the ΔA ⋈ ΔB corner — the classic IVM bug; the
    * registered query's oracle is the full recompute, so that bug is a
    * driver hash-FAIL here, never folklore). Returns oldView ∪ Δ.
    *
    * The 100 TB argument: refreshing the view costs |Δ|-sized joins
    * (delta side broadcast when small) instead of re-joining the two
    * base tables — O(|Δ|·avg-fanout + |view|) rows moved, not
    * O(|A| + |B|). Insert-only, like mergeAggState: deletes need
    * retraction semantics (route through [[apply]] + recompute). */
  def mergeJoinView(oldView: DataFrame, a: DataFrame, b: DataFrame,
      da: DataFrame, db: DataFrame, key: Seq[String]): DataFrame =
    oldView
      .unionByName(da.join(b, key))
      .unionByName(a.join(db, key))
      .unionByName(da.join(db, key))
}
