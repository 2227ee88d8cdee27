package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch math (Cormode & Muthukrishnan, J.Alg 2005) on the
  * PORTABLE md5 hash — deliberately, not xxhash64: counters are exact
  * integer sums per (row, cell), the merge is elementwise addition
  * (associative, commutative — partition-order-free), and the row
  * hashes are the project's cross-engine `('0x' ||
  * substr(md5(v || ':' || r), 1, 15))::BIGINT` convention
  * (TextOps.portableHash), so a DuckDB oracle reconstructs the ENTIRE
  * counter matrix with a GROUP BY and reproduces every estimate
  * bit-for-bit. This is the one sketch family that sits under the
  * full hash gate rather than a bound check — the md5 costs more per
  * update than xxhash64, which is the price of the oracle.
  *
  * Format: depth×width int64 counters, big-endian, row-major.
  * Point-frequency overestimates by at most ε·N (ε = e/width) with
  * probability 1−δ (δ = e^−depth); never underestimates.
  */
object CmsOps {
  val Depth = 4
  val Width = 256

  /** Portable 60-bit row hash of `v` for sketch row `r` — the JVM
    * mirror of TextOps.portableHash over `v || ':' || r`. */
  def rowHash(v: String, r: Int): Long = {
    val md = digest.get()
    md.reset()
    val bytes = md.digest((v + ":" + r).getBytes("UTF-8"))
    // first 15 hex digits = top 60 bits = first 7 bytes + high nibble of the 8th
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (bytes(i) & 0xffL); i += 1 }
    (h << 4) | ((bytes(7) & 0xf0L) >> 4)
  }

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def emptySketch(): Array[Long] = new Array[Long](Depth * Width)

  def add(buf: Array[Long], v: String): Unit = {
    var r = 0
    while (r < Depth) {
      buf(r * Width + (rowHash(v, r) % Width).toInt) += 1L
      r += 1
    }
  }

  def mergeInto(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  /** Codegen entry for [[CmsUnion]]. */
  def unionBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    serialize(mergeInto(deserialize(a), deserialize(b)))

  /** Point-frequency estimate of `v` from a serialized sketch: min of
    * the value's cell across rows. One ByteBuffer wrap per call,
    * absolute reads (the KmvSketch allocation lesson). */
  def estimate(bytes: Array[Byte], v: UTF8String): Long = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = v.toString
    var best = Long.MaxValue
    var r = 0
    while (r < Depth) {
      val c = bb.getLong((r * Width + (rowHash(s, r) % Width).toInt) * 8)
      if (c < best) best = c
      r += 1
    }
    best
  }
}

/** `cms_sketch(v)` — aggregate a string column into a serialized
  * Count-Min sketch (BinaryType). Fixed 8 KiB state regardless of
  * cardinality; partial aggregation never spills; day-over-day
  * sketches union by [[CmsOps.mergeInto]] addition. */
case class CountMinAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_sketch expects string, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Long] = CmsOps.emptySketch()

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CmsOps.add(buf, v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    CmsOps.mergeInto(a, b)

  override def eval(buf: Array[Long]): Any = CmsOps.serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = CmsOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    CmsOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(off: Int): CountMinAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): CountMinAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

object CountMinAgg {
  def apply(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      CountMinAgg(org.apache.spark.sql.graft.ColumnBridge.expression(c))
        .toAggregateExpression())
}

/** `cms_estimate(sketch, v)` — point-frequency lookup. Codegen'd, but
  * in practice it runs on candidate frames (a few hundred rows), not
  * the corpus scan: the sketch answers "how often was THIS value
  * seen", the heavy pass is building the sketch. */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects (binary, string), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(sketch: Any, v: Any): Any =
    CmsOps.estimate(sketch.asInstanceOf[Array[Byte]],
      v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, v) =>
      s"graft.functions.expressions.CmsOps.estimate($s, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  def apply(sketch: Column, v: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      CmsEstimate(org.apache.spark.sql.graft.ColumnBridge.expression(sketch),
        org.apache.spark.sql.graft.ColumnBridge.expression(v)))
}

/** `cms_union(a, b)` — elementwise counter addition of two serialized
  * sketches (associative, commutative): yesterday's sketch + today's
  * = the sketch of the union stream, bit-for-bit. The family twin of
  * hll_union / kmv_union / qsketch_union. */
case class CmsUnion(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_union expects (binary, binary), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CmsOps.serialize(CmsOps.mergeInto(
      CmsOps.deserialize(a.asInstanceOf[Array[Byte]]),
      CmsOps.deserialize(b.asInstanceOf[Array[Byte]])))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.CmsOps.unionBytes($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsUnion =
    copy(left = newLeft, right = newRight)
}

object CmsUnion {
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      CmsUnion(org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))
}
