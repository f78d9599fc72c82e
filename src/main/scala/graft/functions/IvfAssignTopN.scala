package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Top-`nProbe` nearest-centroid ASSIGNMENT of a quantized BIGINT
  * vector against a pinned integer coarse quantizer, optionally through
  * a TWO-LEVEL centroid index — the scale fix for [[graft.ops
  * .Similarity.ivfNearDup]]'s flat assignment scan (VERDICT r12: with
  * nCentroids ∝ n the flat scan is O(n²·dims/load); the two-level form
  * is O(n·√n·dims/load)).
  *
  * Semantics per vector (exact squared-L2 identity, the
  * [[PqEncodeLong]] discipline — ‖q‖² is constant per vector, so
  * distances compare by ‖c‖² − 2·q·c):
  *
  *  1. score the `G` group centroids; keep the `gProbe` nearest
  *     (ties → lower group id);
  *  2. score every member centroid of the kept groups; keep the
  *     `nProbe` nearest (ties → lower code — the same (dist asc,
  *     cluster asc) order the TopKByScore aggregator path used);
  *  3. return their codes as array<int>, (dist asc, code asc)-ordered.
  *
  * With G = 1 (every centroid in one group, gProbe = 1) the scan is
  * EXHAUSTIVE and the selection is bit-identical to the flat
  * broadcast-join + TopKByScore form it replaces — that is the
  * configuration [[graft.ops.Similarity]] uses below its two-level
  * threshold, so driver-verified scales keep their exact assignment
  * (SimilarityEventsSpec pins flat ≡ kernel there). With G ≈ √C the
  * kernel scans gProbe·C/G + G ≪ C centroids; a vector whose true
  * nearest list hides behind an unprobed group can land elsewhere —
  * acceptable for the routed near-dup CANDIDATE stage because the
  * exact cosine re-score downstream only ever prunes, and multi-assign
  * (nProbe ≥ 2) keeps pair recall (measured in SimilarityEventsSpec).
  *
  * Why a kernel and not the relational form (the PqEncodeLong lesson):
  * the broadcast-nested-loop join + ObjectHashAggregate materialized
  * n × nCentroids scored ROWS per assignment pass (156 M at ×100) —
  * the quantizer is driver-side state anyway, so the whole selection
  * is a fused primitive loop inside one map pass: no join, no explode,
  * no aggregate, no exchange.
  *
  * All arithmetic stays in signed-64: |q|, |c| ≤ scale (1024) per
  * element keeps every product ≤ ~2²⁰·dim. Input arrays must have
  * exactly `dim` elements (ragged input throws — the ArrayDotLong
  * strictness discipline).
  *
  * Layout: `cents(code · dim + d)`, `cc(code)` = ‖centroid‖²,
  * `gcents(g · dim + d)`, `gcc(g)`; `members(memberStart(g) until
  * memberStart(g+1))` = the codes in group g, ascending.
  */
case class IvfAssignTopN(child: Expression, cents: Array[Long],
    cc: Array[Long], gcents: Array[Long], gcc: Array[Long],
    memberStart: Array[Int], members: Array[Int], dim: Int,
    gProbe: Int, nProbe: Int)
    extends UnaryExpression {

  private val nCents = cc.length
  private val nGroups = gcc.length

  require(dim >= 1 && nProbe >= 1 && gProbe >= 1,
    s"ivf_assign_topn needs dim/nProbe/gProbe >= 1, got $dim/$nProbe/$gProbe")
  require(cents.length == nCents * dim,
    s"cents length ${cents.length} != nCents*dim (${nCents * dim})")
  require(gcents.length == nGroups * dim,
    s"gcents length ${gcents.length} != nGroups*dim (${nGroups * dim})")
  require(memberStart.length == nGroups + 1 &&
    memberStart.head == 0 && memberStart.last == members.length &&
    members.length == nCents,
    "member offsets must partition the centroid codes by group")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"ivf_assign_topn expects array<bigint> input, got $t")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  /** The whole per-row selection as one JIT-friendly method; the
    * codegen path calls it through a reference object — the per-row
    * work is O(scanned-centroids × dim) multiplies, so a virtual call
    * per row is noise (unlike ArrayDotLong, whose whole body is one
    * short loop and is inlined instead). */
  def assign(q: ArrayData): UnsafeArrayData = {
    if (q.numElements() != dim) {
      throw new IllegalArgumentException(
        s"ivf_assign_topn: expected $dim elements, got ${q.numElements()}")
    }
    val qv = q.toLongArray()
    // top-gProbe groups by (dist asc, group asc): insertion into a
    // bounded sorted buffer (gProbe is a small constant)
    val gk = math.min(gProbe, nGroups)
    val gBest = new Array[Int](gk)
    val gDist = new Array[Long](gk)
    var gn = 0
    var g = 0
    while (g < nGroups) {
      var acc = 0L
      val base = g * dim
      var d = 0
      while (d < dim) { acc += qv(d) * gcents(base + d); d += 1 }
      val dist = gcc(g) - 2L * acc
      // strict (dist, id) order: a tie keeps the earlier (lower) id
      if (gn < gk || dist < gDist(gn - 1)) {
        var i = math.min(gn, gk - 1)
        while (i > 0 && dist < gDist(i - 1)) {
          gDist(i) = gDist(i - 1); gBest(i) = gBest(i - 1); i -= 1
        }
        gDist(i) = dist; gBest(i) = g
        if (gn < gk) gn += 1
      }
      g += 1
    }
    // top-nProbe member centroids of the kept groups, same order
    val ck = math.min(nProbe, nCents)
    val cBest = new Array[Int](ck)
    val cDist = new Array[Long](ck)
    var cn = 0
    var gi = 0
    while (gi < gn) {
      val grp = gBest(gi)
      var mi = memberStart(grp)
      val end = memberStart(grp + 1)
      while (mi < end) {
        val code = members(mi)
        var acc = 0L
        val base = code * dim
        var d = 0
        while (d < dim) { acc += qv(d) * cents(base + d); d += 1 }
        val dist = cc(code) - 2L * acc
        if (cn < ck || dist < cDist(cn - 1) ||
          (dist == cDist(cn - 1) && code < cBest(cn - 1))) {
          var i = math.min(cn, ck - 1)
          while (i > 0 && (dist < cDist(i - 1) ||
            (dist == cDist(i - 1) && code < cBest(i - 1)))) {
            cDist(i) = cDist(i - 1); cBest(i) = cBest(i - 1); i -= 1
          }
          cDist(i) = dist; cBest(i) = code
          if (cn < ck) cn += 1
        }
        mi += 1
      }
      gi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (cn == ck) cBest else java.util.Arrays.copyOf(cBest, cn))
  }

  override def nullSafeEval(input: Any): Any =
    assign(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfAssign", this,
      classOf[IvfAssignTopN].getName)
    nullSafeCodeGen(ctx, ev, q => s"${ev.value} = $ref.assign($q);")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfAssignTopN =
    copy(child = newChild)

  override def prettyName: String = "ivf_assign_topn"
}

object IvfAssignTopN {
  /** Column wrapper over a driver-side coarse quantizer (an m = 1
    * [[graft.ops.Similarity.CodebookModel]]'s cents map) plus a group
    * structure from [[groupCentroids]]. `groups(code)` = group id per
    * centroid code; group ids must be dense 0 until nGroups. */
  def apply(qv: Column, cents: Map[(Int, Int), Array[Long]],
      groups: Array[Int], gcents: Array[Array[Long]], gProbe: Int,
      nProbe: Int): Column = {
    require(cents.nonEmpty, "ivf_assign_topn: empty quantizer")
    val nCents = cents.size
    require((0 until nCents).forall(c => cents.contains((0, c))),
      s"ivf_assign_topn: quantizer keys must be dense (0, 0..${nCents - 1})")
    require(groups.length == nCents,
      s"groups length ${groups.length} != nCents $nCents")
    val dim = cents((0, 0)).length
    val nGroups = gcents.length
    require(groups.forall(g => g >= 0 && g < nGroups),
      "group ids must be dense 0 until nGroups")
    val flat = new Array[Long](nCents * dim)
    val cc = new Array[Long](nCents)
    for (c <- 0 until nCents) {
      val cl = cents((0, c))
      require(cl.length == dim,
        s"ivf_assign_topn: centroid $c has ${cl.length} dims, expected $dim")
      System.arraycopy(cl, 0, flat, c * dim, dim)
      cc(c) = cl.map(x => x * x).sum
    }
    val gflat = new Array[Long](nGroups * dim)
    val gcc = new Array[Long](nGroups)
    for (g <- 0 until nGroups) {
      require(gcents(g).length == dim,
        s"ivf_assign_topn: group centroid $g has ${gcents(g).length} dims")
      System.arraycopy(gcents(g), 0, gflat, g * dim, dim)
      gcc(g) = gcents(g).map(x => x * x).sum
    }
    // codes per group, ascending (iteration order inside a group then
    // matches the flat scan's lower-code-wins tie-break)
    val memberStart = new Array[Int](nGroups + 1)
    groups.foreach(g => memberStart(g + 1) += 1)
    for (g <- 1 to nGroups) memberStart(g) += memberStart(g - 1)
    val fill = memberStart.clone()
    val members = new Array[Int](nCents)
    for (c <- 0 until nCents) { members(fill(groups(c))) = c; fill(groups(c)) += 1 }
    Bridge.column(IvfAssignTopN(Bridge.expression(qv), flat, cc, gflat,
      gcc, memberStart, members, dim, gProbe, nProbe))
  }

  /** The FLAT (exhaustive, exact) configuration: one group holding
    * every centroid — selection is bit-identical to a full scan. */
  def flat(qv: Column, cents: Map[(Int, Int), Array[Long]],
      nProbe: Int): Column = {
    val n = cents.size
    val dim = cents((0, 0)).length
    // the single "group centroid" is never decisive (gProbe = 1 keeps
    // the only group regardless of its distance); zeros keep it cheap
    apply(qv, cents, new Array[Int](n), Array(new Array[Long](dim)),
      gProbe = 1, nProbe = nProbe)
  }

  /** Deterministic integer-Lloyd grouping of a coarse quantizer's
    * centroids into ~√C groups, computed driver-side (C ≤
    * [[graft.ops.Similarity.MaxClusters]] rows of `dim` longs — model
    * scale, exactly where the quantizer itself already lives). Seeds =
    * the G lowest codes' centroids; `rounds` exact argmin assignments
    * (ties → lower group) + per-dim floor-mean updates (floorDiv: the
    * portable pmod identity's sign behavior); empty groups keep their
    * previous center. Pure function of the centroid table — the routed
    * path stays deterministic end to end. */
  def groupCentroids(cents: Map[(Int, Int), Array[Long]],
      rounds: Int = 2): (Array[Int], Array[Array[Long]]) = {
    val nCents = cents.size
    val dim = cents((0, 0)).length
    val c = Array.tabulate(nCents)(i => cents((0, i)))
    val nGroups = math.max(1, math.ceil(math.sqrt(nCents.toDouble)).toInt)
    var gc = Array.tabulate(nGroups)(g => c(g).clone())
    var assign = new Array[Int](nCents)
    def assignAll(): Unit = {
      var i = 0
      while (i < nCents) {
        var best = Long.MaxValue
        var bestG = 0
        var g = 0
        while (g < nGroups) {
          var acc = 0L
          var d = 0
          while (d < dim) {
            val diff = c(i)(d) - gc(g)(d); acc += diff * diff; d += 1
          }
          if (acc < best) { best = acc; bestG = g }
          g += 1
        }
        assign(i) = bestG
        i += 1
      }
    }
    for (_ <- 1 to rounds) {
      assignAll()
      val sums = Array.fill(nGroups)(new Array[Long](dim))
      val counts = new Array[Long](nGroups)
      for (i <- 0 until nCents) {
        val g = assign(i); counts(g) += 1
        var d = 0
        while (d < dim) { sums(g)(d) += c(i)(d); d += 1 }
      }
      gc = Array.tabulate(nGroups)(g =>
        if (counts(g) == 0L) gc(g)
        else Array.tabulate(dim)(d => Math.floorDiv(sums(g)(d), counts(g))))
    }
    assignAll() // final membership against the final centers
    (assign, gc)
  }
}
