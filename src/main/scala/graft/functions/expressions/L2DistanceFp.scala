package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer squared-L2 distance over two `array<bigint>`
  * columns — the ranking metric of the fixed-point ANN family
  * (embed_ann_ivf_fp). The HOF formulation
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0, +)` evaluates
  * its lambdas interpreted (CodegenFallback); this generates one fused
  * primitive loop via `doGenCode` — the CosineSimilarity treatment for
  * the integer metric. The internal fixed-point callers quantize to
  * |q| ≤ 2^20 (per-dimension square ≤ 2^42, 64-dim sum ≤ 2^48 — far
  * inside long range), but `l2_fp` is also registered as a session
  * SQL function, so arbitrary `array<bigint>` input is reachable:
  * arithmetic uses Math.{subtract,multiply,add}Exact and FAILS LOUDLY
  * (ArithmeticException) on overflow instead of silently wrapping to
  * a wrong distance.
  *
  * Semantics match the HOF formulation exactly (integer ops are
  * associative, so fusion cannot change the value — bit-parity pinned
  * in ScaleOpsSpec). NULL input → NULL; length mismatch → NULL
  * (defensive, not an error at scan scale).
  */
case class L2DistanceFp(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"l2_fp expects (array<bigint>, array<bigint>), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0L; var i = 0
      while (i < n) {
        val d = Math.subtractExact(x.getLong(i), y.getLong(i))
        acc = Math.addExact(acc, Math.multiplyExact(d, d))
        i += 1
      }
      java.lang.Long.valueOf(acc)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $d = java.lang.Math.subtractExact($x.getLong($i), $y.getLong($i));
         |    $acc = java.lang.Math.addExact($acc, java.lang.Math.multiplyExact($d, $d));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2DistanceFp =
    copy(left = newLeft, right = newRight)
}

object L2DistanceFp {
  /** Column-API entry point: `l2_fp(a, b)`. */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      L2DistanceFp(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))
}
