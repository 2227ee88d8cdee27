package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.types.{DataType, LongType}

/** HyperLogLog distinct-count sketch as a TypedImperativeAggregate —
  * the custom-sketch extension path from SURVEY.md §7.3 (A2 at 100 TB:
  * exact `count_distinct` stays the correctness contract; the sketch
  * trades ~1.04/√m relative error for O(2^p) fixed state that merges
  * associatively across partitions — partial aggregation never spills,
  * and a daily sketch can be unioned with yesterday's).
  *
  * p register-index bits (default 12 → 4096 registers → ~1.6% stderr),
  * xxhash64 over the input value, standard bias/small-range
  * corrections (Flajolet et al.; linear counting below 2.5m).
  */
case class HllSketchAgg(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
  private val m = 1 << p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null)
      HllOps.update(buf, XxHash64Function.hash(v, child.dataType, 42L))
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllOps.unionInto(a, b)

  override def eval(buf: Array[Byte]): Any =
    java.lang.Long.valueOf(HllOps.estimate(buf))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(off: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): HllSketchAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = newChildren.head)
}

object HllSketchAgg {
  /** Column API: `hll_distinct(c [, p])`. */
  def apply(c: Column, p: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      HllSketchAgg(org.apache.spark.sql.graft.ColumnBridge.expression(c), p)
        .toAggregateExpression())
  def apply(c: Column): Column = apply(c, 12)
}
