package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Misra–Gries frequent-items summary as a TypedImperativeAggregate:
  * at most `capacity` counters of fixed size, mergeable across
  * partitions (Agarwal et al., "Mergeable Summaries": summing two
  * summaries then subtracting the (capacity+1)-th largest count
  * preserves the error bound). Guarantee: every item with true
  * frequency > n/(capacity+1) survives in the summary — NO false
  * negatives above that threshold — while per-item undercount is at
  * most n/(capacity+1).
  *
  * The scale story for "top tokens over 100 TB": a full GROUP BY
  * token materializes |vocabulary| rows per partial aggregate; this
  * keeps O(capacity) state per partition, merges associatively, and a
  * second exact pass over only the returned candidates (a broadcast
  * semi-join) restores exactness — see the `heavy_hitter_tokens`
  * query, whose end result is oracle-exact because of that recount.
  *
  * eval returns the candidate items sorted by estimated count desc
  * (item tiebreak) — estimates are NOT exact counts by construction,
  * so only the membership, not the numbers, should be consumed.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity >= 1 && capacity <= 100000,
    s"capacity must be in [1, 100000], got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects a STRING item, got ${child.dataType.sql}")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < capacity => buf.update(key, 1L)
        case None =>
          // classic MG step: a new item with all counters taken
          // decrements every counter (this item's implicit counter
          // cancels against them); zeros free their slots
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything:
      // keeps <= capacity counters and adds <= that much undercount,
      // which is what the mergeable-summaries bound accounts for
      val t = a.values.toArray.sortBy(-_).apply(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - t)
      a.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.toSeq.sortBy { case (k, c) => (-c, k) }
        .map { case (k, _) => UTF8String.fromString(k) }.toArray[Any])

  // length-prefixed UTF-8, not writeUTF: writeUTF throws on keys over
  // 65535 bytes, and a single unbroken >64 KB "token" (base64 blob,
  // minified JS) is routine in raw-corpus tokenization — it would
  // crash the whole aggregation at serialization time.
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.update(new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  /** Column API: `misra_gries(item [, capacity])`. */
  def apply(c: Column, capacity: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      MisraGriesAgg(org.apache.spark.sql.graft.ColumnBridge.expression(c),
        capacity).toAggregateExpression())
  def apply(c: Column): Column = apply(c, 200)
}
