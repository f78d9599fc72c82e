package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object SimHashKernels {

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** 64-bit SimHash of a whitespace-tokenized document: every token
    * occurrence votes ±1 on each of the 64 bits of its hash; bit i of the
    * result is 1 iff the vote total is strictly positive.
    *
    * Tokenization matches Spark's `split(text, " ")` (limit -1). The token
    * hash is FNV-1a over UTF-16 chars finalized with the murmur3 fmix64
    * avalanche — raw FNV's high bits correlate across short tokens, and
    * SimHash quality is exactly per-bit independence.
    *
    * SimHash is a pure per-document function of its token multiset, so the
    * whole operator is map-only: no explode, no 64-buffer aggregate, no
    * shuffle (the previous formulation paid one partial/final aggregate
    * over every token occurrence in the corpus).
    */
  def simhash64(s: UTF8String): Long = {
    val toks = s.toString.split(" ", -1)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      var h = FnvOffset
      var j = 0
      while (j < t.length) { h ^= t.charAt(j); h *= FnvPrime; j += 1 }
      // murmur3 fmix64 finalizer
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
      h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
      h ^= h >>> 33
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Codegen'd 64-bit SimHash of a string column (see
  * [[SimHashKernels.simhash64]] for the algorithm and why it is map-only).
  *
  * Why custom: the composable form — explode tokens, xxhash64, 64
  * `sum(when(bit,1,-1))` aggregate buffers per doc — shuffles every token
  * occurrence and carries 64 long buffers per group; it dominated the
  * dedup bench. This expression keeps the whole computation inside one
  * whole-stage-codegen'd projection.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects a string input, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHashKernels.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashKernels$$.MODULE$$.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  def apply(c: Column): Column = Bridge.column(SimHash64(Bridge.expression(c)))
}
