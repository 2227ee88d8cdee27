package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Z-order (Morton) interleave of 2-4 pre-normalized 16-bit integer
  * lanes into one sortable long — the clustering key for multi-column
  * data-skipping layouts ([[graft.sources.Layouts.writeZOrdered]]).
  * NULL lanes take 0 (the lowest cell): a missing dimension must
  * still give the row a deterministic, stable place in the layout,
  * not erase the whole key.
  */
case class ZOrderCode(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2 || children.size > 4)
      TypeCheckResult.TypeCheckFailure(
        s"zorder_code takes 2-4 columns, got ${children.size}")
    else if (!children.forall(_.dataType == IntegerType))
      TypeCheckResult.TypeCheckFailure(
        s"zorder_code expects INT lanes (normalize first), got " +
          children.map(_.dataType.sql).mkString(", "))
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    def lane(i: Int): Int = {
      val v = children(i).eval(input)
      if (v == null) 0 else v.asInstanceOf[Int]
    }
    children.size match {
      case 2 => ZOrderOps.z2(lane(0), lane(1))
      case 3 => ZOrderOps.z3(lane(0), lane(1), lane(2))
      case _ => ZOrderOps.z4(lane(0), lane(1), lane(2), lane(3))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val args = gens.map(g => s"(${g.isNull} ? 0 : ${g.value})").mkString(", ")
    val call =
      s"graft.functions.expressions.ZOrderOps.z${children.size}($args)"
    ev.copy(
      code = gens.map(_.code).reduce(_ + _) +
        code"""final long ${ev.value} = $call;""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderCode =
    copy(children = newChildren)
}

object ZOrderCode {
  def apply(cols: Column*): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(ZOrderCode(
      cols.map(org.apache.spark.sql.graft.ColumnBridge.expression)))
}
