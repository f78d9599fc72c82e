package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Dot product of two float-array columns, accumulated in double —
  * a native Catalyst expression with whole-stage codegen.
  *
  * Why custom: the composable form `aggregate(zip_with(a,b,*),0d,+)` is
  * correct but interpreted (higher-order functions don't codegen and
  * allocate an intermediate array per row) — at 2M candidate pairs × 64
  * dims that dominated the benchmark. This kernel is a tight primitive
  * loop inside WholeStageCodegen: no allocation, no virtual calls.
  *
  * Semantics are identical to the interpreted form (sequential
  * accumulation, per-element float→double widening), so results stay
  * bit-identical to the DuckDB oracle's list_dot_product on DOUBLE[].
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_dot expects two array<float> inputs, got $l / $r")
    }

  override def dataType: DataType = DoubleType

  // STRICT lengths (ADVICE r10): the DuckDB twin list_dot_product
  // errors on mismatched lengths — a ragged embedding column must fail
  // loudly in BOTH engines, never silently truncate to a wrong dot.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      throw new IllegalArgumentException(
        s"array_dot: mismatched lengths $n vs ${y.numElements()}")
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "array_dot: mismatched lengths " + $n + " vs " +
         |    $b.numElements());
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_dot"
}

object ArrayDot {
  /** Column-level wrapper: dot(a, b) for two array<float> columns. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(ArrayDot(Bridge.expression(a), Bridge.expression(b)))
}
