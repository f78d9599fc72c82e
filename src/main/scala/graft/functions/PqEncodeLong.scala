package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Nearest-codeword PQ ENCODE of a quantized BIGINT vector against a
  * pinned integer codebook: for each of `m` subspaces, the argmin code
  * over `nCodes` codewords of the exact squared-L2 identity
  * ‖q−c‖² = ‖q‖² − 2·q·c + ‖c‖² (the ‖q‖² term is constant per
  * subspace, so the loop minimizes ‖c‖² − 2·q·c), ties → LOWER code —
  * bit-for-bit the semantics of the join/aggregate form it replaces.
  *
  * Why custom (the [[ArrayDotLong]] lesson one level up): the
  * relational encode — explode to (vec_id, s) rows, broadcast-join the
  * codebook, min-struct aggregate — materializes O(N·m·nCodes) rows
  * through a join and an exchange per encode pass; the round-10
  * integer-Lloyd promotion paid ≈ +7 s at sf0.1 and 193 s at ×100
  * through that shape. The codebook is DRIVER-SIDE state (it is
  * collected between Lloyd rounds anyway, like an ml model's
  * coefficients), so the whole argmin is a tight three-level loop over
  * constants inside WholeStageCodegen: one MAP pass over the corpus,
  * no explode, no join, no aggregate.
  *
  * Layout: `codebook(s · nCodes · subDim + code · subDim + d)` and
  * `cc(s · nCodes + code)` = ‖codeword‖², both precomputed once on the
  * driver and shipped as codegen references. All arithmetic stays in
  * signed-64: |q| ≤ scale (1024 default) per element keeps every
  * product ≤ ~2²⁰·subDim — identical in the DuckDB oracle twin.
  *
  * Input arrays must have EXACTLY m·subDim elements (a ragged vector
  * throws — the ArrayDotLong strictness discipline; silent truncation
  * would diverge from the oracle). Returns array<int> of m codes.
  */
case class PqEncodeLong(child: Expression, codebook: Array[Long],
    cc: Array[Long], m: Int, subDim: Int, nCodes: Int)
    extends UnaryExpression {

  require(m >= 1 && subDim >= 1 && nCodes >= 1,
    s"pq_encode_long needs m/subDim/nCodes >= 1, got $m/$subDim/$nCodes")
  require(codebook.length == m * nCodes * subDim,
    s"codebook length ${codebook.length} != m*nCodes*subDim " +
      s"(${m * nCodes * subDim})")
  require(cc.length == m * nCodes,
    s"cc length ${cc.length} != m*nCodes (${m * nCodes})")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"pq_encode_long expects array<bigint> input, got $t")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    if (q.numElements() != m * subDim) {
      throw new IllegalArgumentException(
        s"pq_encode_long: expected ${m * subDim} elements, got " +
          q.numElements())
    }
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = Long.MaxValue
      var bestCode = 0
      var code = 0
      while (code < nCodes) {
        var acc = 0L
        val base = (s * nCodes + code) * subDim
        var d = 0
        while (d < subDim) {
          acc += q.getLong(s * subDim + d) * codebook(base + d)
          d += 1
        }
        val dist = cc(s * nCodes + code) - 2L * acc
        if (dist < best) { best = dist; bestCode = code }
        code += 1
      }
      codes(s) = bestCode
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "long[]")
    val ccRef = ctx.addReferenceObj("pqCc", cc, "long[]")
    nullSafeCodeGen(ctx, ev, q => {
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val code = ctx.freshName("code")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val dist = ctx.freshName("dist")
      val best = ctx.freshName("best")
      val bestCode = ctx.freshName("bestCode")
      s"""
         |if ($q.numElements() != ${m * subDim}) {
         |  throw new IllegalArgumentException(
         |    "pq_encode_long: expected ${m * subDim} elements, got " +
         |    $q.numElements());
         |}
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  long $best = Long.MAX_VALUE;
         |  int $bestCode = 0;
         |  for (int $code = 0; $code < $nCodes; $code++) {
         |    long $acc = 0L;
         |    int $base = ($s * $nCodes + $code) * $subDim;
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      $acc += $q.getLong($s * $subDim + $d) * $cbRef[$base + $d];
         |    }
         |    long $dist = $ccRef[$s * $nCodes + $code] - 2L * $acc;
         |    if ($dist < $best) { $best = $dist; $bestCode = $code; }
         |  }
         |  $codes[$s] = $bestCode;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeLong =
    copy(child = newChild)

  override def prettyName: String = "pq_encode_long"
}

object PqEncodeLong {
  /** Column wrapper: encode an array<bigint> vector against a pinned
    * driver-side codebook keyed (subspace, code) → codeword longs.
    * The key space must be DENSE over s < m, code < nCodes (the
    * integer-Lloyd fit guarantees it: every seeded code keeps a
    * centroid forever). */
  def apply(qv: Column, cents: Map[(Int, Int), Array[Long]], m: Int,
      subDim: Int): Column = {
    require(cents.nonEmpty, "pq_encode_long: empty codebook")
    val nCodes = cents.size / m
    require(nCodes * m == cents.size &&
      (0 until m).forall(s => (0 until nCodes).forall(c =>
        cents.contains((s, c)))),
      s"pq_encode_long: codebook keys must be dense over ${m}×$nCodes, " +
        s"got ${cents.size} entries")
    val flat = new Array[Long](m * nCodes * subDim)
    val cc = new Array[Long](m * nCodes)
    for (s <- 0 until m; c <- 0 until nCodes) {
      val cl = cents((s, c))
      require(cl.length == subDim,
        s"pq_encode_long: codeword ($s,$c) has ${cl.length} dims, " +
          s"expected $subDim")
      System.arraycopy(cl, 0, flat, (s * nCodes + c) * subDim, subDim)
      cc(s * nCodes + c) = cl.map(x => x * x).sum
    }
    Bridge.column(PqEncodeLong(Bridge.expression(qv), flat, cc, m, subDim,
      nCodes))
  }
}
