package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (score, key) candidate row for [[TopKByScore]]. */
case class Scored(score: Double, key: Long)

/** Exact per-group top-k as a typed `Aggregator` — the partial-aggregation
  * alternative to the window-function top-n (`Relational.topNPerGroup`):
  * `row_number() OVER (PARTITION BY g ORDER BY …)` must sort EVERY row of
  * every group after a full shuffle, while an aggregator keeps a k-row
  * buffer per group and combines map-side, so the exchange carries at most
  * k rows per (group, map partition) — at 100 TB the difference between
  * shuffling the table and shuffling ~k·groups rows. Spark plans typed
  * aggregators as ObjectHashAggregate (partial + final), which is exactly
  * that shape; PlanShapeSpec asserts it.
  *
  * Ordering is total and deterministic: score descending, key ascending —
  * the same (O1-style) tie-break discipline as every ranked query in this
  * repo, so the result is bit-identical to the window formulation and the
  * two share one DuckDB oracle. Score comparison matches Spark's
  * `ORDER BY score DESC` total order exactly (SQLOrderingUtil): NaN
  * ranks greatest (FIRST in desc, like the window form — Scala tuple
  * `-score` sorting would invert that, and `<`/`==` fast-path checks
  * are always false for NaN), and -0.0 is normalized to 0.0 before
  * comparing (raw `Double.compare` would order them and diverge from
  * the window form on signed-zero ties).
  *
  * The buffer is a sorted ≤k-element Seq; reduce/merge re-sort k+1 (or 2k)
  * elements. Fine for presentation-sized k (≤ ~100); a binary-heap buffer
  * would only matter beyond that.
  */
class TopKByScore(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k >= 1, s"k >= 1, got $k")

  // score DESC (NaN greatest, -0.0 == 0.0, like Spark's ordering),
  // then key ASC; `+ 0.0` normalizes -0.0 to 0.0 and is exact for
  // every other double (NaN and infinities included)
  private val ord: Ordering[Scored] = (a: Scored, b: Scored) => {
    val c = java.lang.Double.compare(b.score + 0.0d, a.score + 0.0d)
    if (c != 0) c else java.lang.Long.compare(a.key, b.key)
  }

  private def best(xs: Seq[Scored]): Seq[Scored] = xs.sorted(ord).take(k)

  override def zero: Seq[Scored] = Nil
  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
    // a candidate worse than a full buffer's floor can never enter
    if (b.size >= k && ord.compare(a, b.last) > 0) b
    else best(b :+ a)
  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    best(b1 ++ b2)
  override def finish(r: Seq[Scored]): Seq[Scored] = r
  override def bufferEncoder: ExpressionEncoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: ExpressionEncoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
}
