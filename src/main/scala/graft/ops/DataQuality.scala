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

  /** Rule INFERENCE — the other direction of [[report]]: profile the
    * table once and emit the expectation rules the data already
    * satisfies (not-null, unique-key candidates, small-domain enums,
    * numeric ranges), each with its supporting evidence. The output is
    * the draft contract a new ingest source gets reviewed against; the
    * suggestions feed straight back into [[Check]]/[[Unique]] rules.
    *
    * Execution: ONE fused profile scan for every count (null counts,
    * exact distinct counts, integer min/max — a column costs aggregates,
    * not passes), plus one `distinct → orderBy → limit(enumMax+1)` probe
    * per STRING column for the enum domain — bounded by construction:
    * the TakeOrdered cap means a high-cardinality column contributes at
    * most enumMax+1 rows of state, never its value universe (the
    * collect_set spelling would buffer every distinct value per column
    * — the exact blowup this shape exists to avoid). No driver
    * decisions: gates are evaluated in-plan, so the whole inference is
    * one deterministic query both engines can run.
    *
    * `numCols` must be integer-typed (min/max surface as BIGINT — the
    * cross-engine exactness discipline; profile float money columns
    * through their cents form instead). Output: (col_name, rule,
    * n_rows, n_null, n_distinct, details), only rules that HOLD. */
  def suggestRules(df: DataFrame, numCols: Seq[String],
      strCols: Seq[String], enumMax: Int = 12): DataFrame = {
    val all = numCols ++ strCols
    require(all.nonEmpty, "need at least one column")
    require(all.distinct.size == all.size, "duplicate column in profile")
    val aggs = all.flatMap { c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c")) } ++
      numCols.flatMap { c => Seq(
        min(col(c)).cast("long").as(s"mn_$c"),
        max(col(c)).cast("long").as(s"mx_$c")) }
    val prof = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val doms = strCols.map { c =>
      df.select(col(c)).filter(col(c).isNotNull).distinct()
        .orderBy(c).limit(enumMax + 1)
        .agg(array_join(array_sort(collect_list(col(c))), ",")
          .as(s"dom_$c"))
    }
    val joined = doms.foldLeft(prof)((p, d) => p.crossJoin(d))
    val entries = all.flatMap { c =>
      val nn = col(s"nn_$c")
      val nd = col(s"nd_$c")
      def e(rule: String, ok: Column, details: Column) =
        struct(lit(c).as("col_name"), lit(rule).as("rule"), ok.as("ok"),
          nn.as("n_null"), nd.as("n_distinct"), details.as("details"))
      Seq(
        e("not_null", nn === 0L, lit("")),
        e("unique", col("n_rows") > nn && nd === col("n_rows") - nn,
          lit(""))) ++
        (if (numCols.contains(c))
          Seq(e("range", col("n_rows") > nn,
            concat_ws("..", col(s"mn_$c"), col(s"mx_$c"))))
        else
          Seq(e("enum", nd > 0L && nd <= enumMax, col(s"dom_$c"))))
    }
    joined.select(col("n_rows"), explode(array(entries: _*)).as("e"))
      .filter(col("e.ok"))
      .select(col("e.col_name").as("col_name"), col("e.rule").as("rule"),
        col("n_rows"), col("e.n_null").as("n_null"),
        col("e.n_distinct").as("n_distinct"),
        col("e.details").as("details"))
      .orderBy("col_name", "rule")
  }

  /** Distribution-drift report between a reference slice and a current
    * slice of the same numeric column — the monitor every scheduled
    * ingest runs so a silent upstream change (new price tier, unit
    * switch, truncated feed) is caught as a DISTRIBUTION shift even when
    * row counts and null rates look healthy.
    *
    * Both slices are histogrammed into the same `nBuckets` equal-width
    * integer buckets (clamped at the edges, the sketch_hist discipline);
    * the report carries per-bucket counts and floor-bp shares, the
    * per-bucket share delta, and two whole-distribution statistics
    * riding along on every row: total variation distance
    * `tvd_bp = Σ|Δbp| div 2` and the worst single bucket `linf_bp`.
    * TVD over bp-quantized shares (not PSI) is deliberate: it needs no
    * logarithm, so the WHOLE report is integer arithmetic and
    * hash-oracles cross-engine — PSI's ln() would make the gate number
    * float-fragile exactly where a release decision hangs on it.
    *
    * Empty slices fail loudly in-plan (`assert_true`): a drift monitor
    * that returns NULL shares on a dead feed is itself the incident.
    *
    * Scale shape: the two slices union into ONE scan with a side tag —
    * one hash aggregate to ≤nBuckets rows (conditional sums give both
    * histograms in one pass), then 1-row broadcast totals. Buckets with
    * no mass in either slice are absent (sparse output). At 100 TB the
    * report costs exactly one fact-scan + a bucket-width shuffle. */
  def distributionDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
      lo: Long, width: Long, nBuckets: Int): DataFrame = {
    require(width >= 1, s"bucket width >= 1, got $width")
    require(nBuckets >= 2, s"need >= 2 buckets, got $nBuckets")
    def tagged(df: DataFrame, s: Int) =
      df.select(col(valueCol).cast("long").as("v"))
        .select(least(lit(nBuckets - 1L), greatest(lit(0L),
          expr(s"(v - $lo) div $width"))).as("bucket"),
          lit(s).as("side"))
    val counts = tagged(ref, 0).unionByName(tagged(cur, 1))
      .groupBy("bucket")
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("n_cur"))
    val tot = counts.agg(
      coalesce(sum("n_ref"), lit(0L)).as("nr"),
      coalesce(sum("n_cur"), lit(0L)).as("nc"))
    val per = counts.crossJoin(broadcast(tot))
      .withColumn("ref_bp",
        when(assert_true(col("nr") > 0 && col("nc") > 0,
          lit("distributionDrift: a slice is empty — a dead feed is " +
            "the incident, not a zero-drift pass")).isNull,
          expr("n_ref * 10000 div nr")))
      // gated on the asserted column so the guard fires BEFORE the
      // division can raise ANSI DIVIDE_BY_ZERO with the wrong story
      .withColumn("cur_bp",
        when(col("ref_bp").isNotNull, expr("n_cur * 10000 div nc")))
      .withColumn("delta_bp", abs(col("cur_bp") - col("ref_bp")))
    val whole = per.agg(
      expr("sum(delta_bp) div 2").as("tvd_bp"),
      max("delta_bp").as("linf_bp"))
    per.crossJoin(broadcast(whole))
      .select("bucket", "n_ref", "n_cur", "ref_bp", "cur_bp",
        "delta_bp", "tvd_bp", "linf_bp")
      .orderBy("bucket")
  }

  /** Benford's-law first-digit milli shares: log₁₀(1+1/d) for d = 1..9,
    * pre-floored so both engines compare against the same integers. */
  private val BenfordMilli = Seq(301L, 176L, 124L, 96L, 79L, 66L, 57L,
    51L, 45L)

  /** Benford first-significant-digit audit — the classic fabricated-data
    * screen on any naturally-spread money/size column: organic amounts
    * lead with 1 ~30% of the time; invented ones cluster uniformly.
    * Values are quantized to exact cents first (the moneySum
    * discipline), so the leading digit is a pure string operation on a
    * BIGINT — no float log anywhere — and every output column is an
    * integer: per-digit count, observed share (milli), Benford's
    * expected share (milli, pre-floored constants), absolute deviation,
    * and the total-variation-style sum of deviations riding on every
    * row. Non-positive values are excluded (they carry no leading
    * digit), their count surfaced as `n_dropped` so a gate can notice a
    * feed gone negative.
    *
    * Scale: one scan → 9-row hash aggregate; everything after runs on
    * the 9-row table. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val cents = expr(s"CAST(round($valueCol * 100) AS BIGINT)")
    val tagged = df.select(cents.as("cents"))
    val digits = tagged.filter(col("cents") > 0)
      .select(substring(col("cents").cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = tagged.agg(
      sum((col("cents") > 0).cast("long")).as("n_pos"),
      sum((col("cents") <= 0).cast("long")).as("n_dropped"))
    val per = digits.crossJoin(broadcast(tot))
      .withColumn("share_milli", expr("n * 1000 div n_pos"))
      .withColumn("benford_milli",
        element_at(typedLit(BenfordMilli), col("digit").cast("int")))
      .withColumn("dev_milli", abs(col("share_milli") - col("benford_milli")))
    per.crossJoin(broadcast(
        per.agg(sum("dev_milli").as("total_dev_milli"))))
      .select("digit", "n", "share_milli", "benford_milli", "dev_milli",
        "n_dropped", "total_dev_milli")
      .orderBy("digit")
  }
}
