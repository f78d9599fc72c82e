package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded bottom-k DISTINCT-hash buffer as a typed `Aggregator` — the
  * KMV (k-minimum-values) sketch state built in ONE pass with partial
  * aggregation, per group.
  *
  * Why this exists next to [[graft.ops.Sketches.kmvBottom]]: the
  * relational form runs `distinct()` BEFORE the bottom-k, which
  * shuffles every distinct key — the exact-dedup cost the sketch is
  * supposed to avoid. This aggregator dedups INSIDE a ≤k-element
  * sorted-set buffer, so the map side sends at most k rows per (group,
  * map partition) across the exchange and the full key stream never
  * shuffles — the true sketch shape at 100 TB. The k smallest distinct
  * hash values are a pure function of the data (bottom-k sets compose
  * under union — the [[graft.ops.Sketches.kmvJaccard]] closure
  * property), so the result is partition-layout-independent and
  * DuckDB-oracle-checkable (`SELECT DISTINCT hv ORDER BY hv LIMIT k`).
  *
  * Null inputs are skipped (a null hash is a null key upstream).
  * Buffer ops are O(log k) per row with an early reject against the
  * current k-th value; inserts beyond the seed phase happen ~k·ln(n)/n
  * of the time, so the pass is scan-bound. Output is the ascending
  * hash list (≤ k values): `size < k` means the buffer IS the distinct
  * universe (exact count); otherwise `(k−1)·R / last` estimates it
  * (Bar-Yossef et al., RANDOM 2002 — see
  * [[graft.ops.Sketches.kmvSummary]]).
  */
class KmvBottomAgg(k: Int) extends Aggregator[
    java.lang.Long, java.util.TreeSet[java.lang.Long], Seq[Long]] {
  require(k >= 1, s"k >= 1, got $k")

  override def zero: java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def reduce(b: java.util.TreeSet[java.lang.Long],
      h: java.lang.Long): java.util.TreeSet[java.lang.Long] = {
    if (h != null) {
      if (b.size < k) b.add(h)
      else if (h.longValue < b.last.longValue && b.add(h)) b.pollLast()
    }
    b
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) reduce(a, it.next())
    a
  }

  override def finish(b: java.util.TreeSet[java.lang.Long]): Seq[Long] = {
    val out = new Array[Long](b.size)
    var i = 0
    val it = b.iterator()
    while (it.hasNext) { out(i) = it.next().longValue; i += 1 }
    out.toSeq
  }

  override def bufferEncoder: Encoder[java.util.TreeSet[java.lang.Long]] =
    Encoders.kryo[java.util.TreeSet[java.lang.Long]]
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
