package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** The quantile-sketch column family, mirroring the HLL one
  * ([[HllSketch]]): `QuantileSketchBuild` aggregates a numeric column
  * into canonical sketch BYTES — the persistable column a snapshot
  * table stores per key — and the scalar `QSketchUnion` /
  * `QSketchQuantile` expressions merge and read such columns. Because
  * the merge is bucket-wise addition ([[QuantileOps]]), a latency/size
  * percentile kept as a sketch column is incrementally maintainable:
  * each micro-batch unions its delta into the stored sketch, and any
  * rollup (user -> cohort, day -> month) re-aggregates bytes, never
  * re-sorts 100 TB of raw values — the at-scale answer to "exact
  * `percentile` sorts every group".
  */
case class QuantileSketchAgg(
    child: Expression,
    q: Double,
    alpha: Double = 0.01,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileOps.State] {

  require(q >= 0.0 && q <= 1.0, s"q must be in [0,1], got $q")
  require(alpha > 0.0 && alpha < 0.5, s"alpha must be in (0,0.5), got $alpha")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true // empty group -> NULL
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"qsketch_quantile expects a numeric column, got ${other.sql}")
  }

  private lazy val toDouble: Any => Double = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      v => v.asInstanceOf[Number].longValue().toDouble
    case FloatType => v => v.asInstanceOf[Float].toDouble
    case DoubleType => v => v.asInstanceOf[Double]
    case _: DecimalType => v => v.asInstanceOf[Decimal].toDouble
    case other => throw new IllegalStateException(s"unexpected type $other")
  }

  override def createAggregationBuffer(): QuantileOps.State =
    new QuantileOps.State(alpha)

  override def update(buf: QuantileOps.State, input: InternalRow): QuantileOps.State = {
    val v = child.eval(input)
    if (v != null) buf.insert(toDouble(v))
    buf
  }

  override def merge(a: QuantileOps.State, b: QuantileOps.State): QuantileOps.State =
    a.mergeIn(b)

  override def eval(buf: QuantileOps.State): Any = {
    val est = buf.quantile(q)
    if (est.isNaN) null else est
  }

  override def serialize(buf: QuantileOps.State): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): QuantileOps.State =
    QuantileOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(off: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(child = newChildren.head)
}

object QuantileSketchAgg {
  def apply(c: Column, q: Double, alpha: Double): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      QuantileSketchAgg(org.apache.spark.sql.graft.ColumnBridge.expression(c), q, alpha)
        .toAggregateExpression())
  def apply(c: Column, q: Double): Column = apply(c, q, 0.01)
}

/** Aggregate a numeric column into persistable sketch bytes. */
case class QuantileSketchBuild(
    child: Expression,
    alpha: Double = 0.01,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileOps.State] {

  require(alpha > 0.0 && alpha < 0.5, s"alpha must be in (0,0.5), got $alpha")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false // empty group -> empty sketch
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"qsketch expects a numeric column, got ${other.sql}")
  }

  private lazy val toDouble: Any => Double = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      v => v.asInstanceOf[Number].longValue().toDouble
    case FloatType => v => v.asInstanceOf[Float].toDouble
    case DoubleType => v => v.asInstanceOf[Double]
    case _: DecimalType => v => v.asInstanceOf[Decimal].toDouble
    case other => throw new IllegalStateException(s"unexpected type $other")
  }

  override def createAggregationBuffer(): QuantileOps.State =
    new QuantileOps.State(alpha)

  override def update(buf: QuantileOps.State, input: InternalRow): QuantileOps.State = {
    val v = child.eval(input)
    if (v != null) buf.insert(toDouble(v))
    buf
  }

  override def merge(a: QuantileOps.State, b: QuantileOps.State): QuantileOps.State =
    a.mergeIn(b)

  override def eval(buf: QuantileOps.State): Any = buf.serialize()

  override def serialize(buf: QuantileOps.State): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): QuantileOps.State =
    QuantileOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(off: Int): QuantileSketchBuild =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): QuantileSketchBuild =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchBuild =
    copy(child = newChildren.head)
}

object QuantileSketchBuild {
  def apply(c: Column, alpha: Double): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      QuantileSketchBuild(org.apache.spark.sql.graft.ColumnBridge.expression(c), alpha)
        .toAggregateExpression())
  def apply(c: Column): Column = apply(c, 0.01)
}

/** Bucket-wise-additive union of two sketch byte columns (codegen'd
  * via a static call; strict nulls — callers coalesce absent sides). */
case class QSketchUnion(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"qsketch_union expects (binary, binary), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    QuantileOps.union(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.QuantileOps.union($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QSketchUnion =
    copy(left = newLeft, right = newRight)
}

object QSketchUnion {
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(QSketchUnion(
      org.apache.spark.sql.graft.ColumnBridge.expression(a),
      org.apache.spark.sql.graft.ColumnBridge.expression(b)))
}

/** Quantile read of a sketch byte column; NULL on an empty sketch. */
case class QSketchQuantile(child: Expression, q: Double)
  extends UnaryExpression {

  require(q >= 0.0 && q <= 1.0, s"q must be in [0,1], got $q")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"qsketch_value expects binary, got ${child.dataType}")

  override protected def nullSafeEval(bytes: Any): Any = {
    val r = QuantileOps.value(bytes.asInstanceOf[Array[Byte]], q)
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      java.lang.Double r = graft.functions.expressions.QuantileOps.value($b, $q);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
    """)

  override protected def withNewChildInternal(newChild: Expression): QSketchQuantile =
    copy(child = newChild)
}

object QSketchQuantile {
  def apply(c: Column, q: Double): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      QSketchQuantile(org.apache.spark.sql.graft.ColumnBridge.expression(c), q))
}
