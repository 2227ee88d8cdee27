package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** KMV (k-minimum-values) theta sketch — the SET-OPERATION sketch the
  * HLL family can't be: keeping the k smallest distinct 64-bit hashes
  * of a set yields a fixed-size uniform SAMPLE of it, so two sketches
  * support an unbiased distinct-INTERSECTION estimate (Beyer et al.,
  * SIGMOD'07; the Apache DataSketches theta design). HLL registers only
  * union — |A∩B| via inclusion-exclusion inherits the absolute error of
  * |A∪B| and collapses for small overlaps; KMV estimates the overlap
  * from the shared sample directly.
  *
  * 100 TB shape: "how much does crawl B duplicate crawl A?" without a
  * join — one sketch per corpus slice (O(k) state, map-side partial,
  * associatively mergeable, persistable like the HLL/qsketch column
  * families), then any pairwise overlap matrix is arithmetic over the
  * tiny sketch frame.
  *
  * Canonical bytes: [int32 k][int32 n][n×int64 hashes, UNSIGNED
  * ascending] — a set's sketch is bit-identical under any partitioning
  * or merge order (it is a deterministic function of the hash SET), so
  * sketch columns are hash-stable across runs and engines' storage.
  *
  * Estimators (θ = normalized k-th smallest hash = the kept max when
  * full, 1.0 otherwise; the kept values BELOW θ are a uniform sample of
  * the set at rate θ):
  *   distinct:  n < k → n (exact);  else (k-1)/θ
  *   intersect: θ* = min(θ_A, θ_B); |{shared hashes < θ*}| / θ*
  */
object KmvOps {

  private val TwoPow64 = 1.8446744073709552e19

  /** Unsigned-order comparator used by the aggregation buffer. */
  val UnsignedOrder: java.util.Comparator[java.lang.Long] =
    (a: java.lang.Long, b: java.lang.Long) =>
      java.lang.Long.compareUnsigned(a.longValue(), b.longValue())

  private def toUnsignedDouble(h: Long): Double =
    if (h >= 0) h.toDouble else h.toDouble + TwoPow64

  /** Mutable aggregation state: capacity + unsigned-ordered hash set. */
  final class Buffer(val k: Int) {
    val set = new java.util.TreeSet[java.lang.Long](UnsignedOrder)
    def insert(h: Long): Unit = {
      if (set.size < k) { set.add(h); () }
      else if (java.lang.Long.compareUnsigned(h, set.last()) < 0 && set.add(h))
        set.pollLast()
    }
  }

  def serialize(buf: Buffer): Array[Byte] = {
    val n = buf.set.size
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * n)
    bb.putInt(buf.k).putInt(n)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Buffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.set.add(bb.getLong); i += 1 }
    buf
  }

  // allocation-free absolute reads (big-endian, matching ByteBuffer):
  // union/intersect are per-row scalar paths that index the arrays O(k)
  // times — a ByteBuffer.wrap per access would be O(k) garbage per row
  private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def readLong(b: Array[Byte], off: Int): Long =
    (readInt(b, off).toLong << 32) | (readInt(b, off + 4).toLong & 0xffffffffL)
  private def kOf(b: Array[Byte]): Int = readInt(b, 0)
  private def nOf(b: Array[Byte]): Int = readInt(b, 4)
  private def hashAt(b: Array[Byte], i: Int): Long = readLong(b, 8 + 8 * i)

  /** Normalized sampling threshold θ ∈ (0, 1]. */
  private def theta(b: Array[Byte]): Double = {
    val (k, n) = (kOf(b), nOf(b))
    if (n < k) 1.0 else toUnsignedDouble(hashAt(b, n - 1)) / TwoPow64
  }

  def estimate(b: Array[Byte]): Long = {
    val (k, n) = (kOf(b), nOf(b))
    if (n < k) n.toLong else Math.round((k - 1).toDouble / theta(b))
  }

  /** KMV of the set union, capacity min(k_A, k_B): merge-walk the two
    * unsigned-ascending lists, dedup, keep the k smallest. Exactly the
    * sketch a one-shot build over A∪B would produce. */
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val k = math.min(kOf(a), kOf(b))
    val (na, nb) = (nOf(a), nOf(b))
    val out = java.nio.ByteBuffer.allocate(8 + 8 * math.min(k, na + nb))
    out.putInt(k).putInt(0)
    var (i, j, m) = (0, 0, 0)
    while (m < k && (i < na || j < nb)) {
      val take =
        if (i >= na) { val v = hashAt(b, j); j += 1; v }
        else if (j >= nb) { val v = hashAt(a, i); i += 1; v }
        else {
          val (va, vb) = (hashAt(a, i), hashAt(b, j))
          val c = java.lang.Long.compareUnsigned(va, vb)
          if (c <= 0) { i += 1; if (c == 0) j += 1; va }
          else { j += 1; vb }
        }
      out.putLong(take); m += 1
    }
    out.putInt(4, m)
    java.util.Arrays.copyOf(out.array(), 8 + 8 * m)
  }

  // ---- portable md5 40-bit family: the EXACT-GATE variant ----------
  //
  // The xxhash64 build above is the production path (cheapest per
  // update) but its estimates are only bound-checkable — no other
  // engine reproduces Spark's xxhash64 seed convention. This family is
  // the token_freq_cms recipe applied to the SET-OPERATION sketch:
  // hashes are the first 10 hex chars of md5 (DuckDB:
  // `('0x' || substr(md5(s), 1, 10))::BIGINT` — 40 bits, so every
  // estimator below stays in exact BIGINT arithmetic), and the
  // estimators replace float θ-division with integer floor division,
  // making sketch bytes AND estimates bit-reproducible from a plain
  // GROUP BY + min-k in any engine. 40-bit collisions are harmless to
  // the gate (both engines hash identically, so they see the same
  // hashed set) and negligible to accuracy below ~2^20 distinct.

  /** Normalized hash space of the md5-40 family: 2^40. */
  val HashSpace40: Long = 1L << 40

  /** First 40 bits of md5(s) — bit-identical to the DuckDB expression
    * above (first 5 digest bytes, big-endian). */
  def md5Hash40(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) | ((d(2) & 0xffL) << 16) |
      ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
  }

  /** θ as a raw 40-bit hash value (2^40 ≡ θ=1 when not full). */
  private def theta40(b: Array[Byte]): Long = {
    val (k, n) = (kOf(b), nOf(b))
    if (n < k) HashSpace40 else hashAt(b, n - 1)
  }

  /** Distinct estimate in pure integer arithmetic:
    * n < k → n (exact); else (k−1)·2^40 // θ_hash. */
  def estimate40(b: Array[Byte]): Long = {
    val (k, n) = (kOf(b), nOf(b))
    if (n < k) n.toLong else (k - 1).toLong * HashSpace40 / theta40(b)
  }

  /** Distinct-intersection estimate, integer form: shared hashes
    * strictly below the joint raw threshold, scaled by
    * 2^40 // θ*_hash. Exact when neither sketch is full. */
  def intersect40(a: Array[Byte], b: Array[Byte]): Long = {
    val t = math.min(theta40(a), theta40(b))
    val (na, nb) = (nOf(a), nOf(b))
    var (i, j, shared) = (0, 0, 0L)
    while (i < na && j < nb) {
      val (va, vb) = (hashAt(a, i), hashAt(b, j))
      if (va == vb) {
        if (va < t) shared += 1
        i += 1; j += 1
      } else if (va < vb) i += 1
      else j += 1
    }
    shared * HashSpace40 / t
  }

  /** Distinct-intersection estimate: shared hashes below the joint
    * threshold, scaled by the sampling rate. Exact when neither sketch
    * is full (both kept every hash). */
  def intersect(a: Array[Byte], b: Array[Byte]): Long = {
    val t = math.min(theta(a), theta(b))
    val cut = t * TwoPow64
    val (na, nb) = (nOf(a), nOf(b))
    var (i, j, shared) = (0, 0, 0L)
    while (i < na && j < nb) {
      val (va, vb) = (hashAt(a, i), hashAt(b, j))
      val c = java.lang.Long.compareUnsigned(va, vb)
      if (c == 0) {
        if (toUnsignedDouble(va) < cut) shared += 1
        i += 1; j += 1
      } else if (c < 0) i += 1
      else j += 1
    }
    Math.round(shared / t)
  }
}

/** Aggregate a column into KMV sketch bytes (the persistable column —
  * the HllSketchBuild twin; same xxhash64 seed as the HLL family so a
  * value hashes identically in both). */
case class KmvSketchBuild(
    child: Expression,
    k: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvOps.Buffer] {

  require(k >= 8 && k <= (1 << 20), s"k must be in [8, 2^20], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KmvOps.Buffer = new KmvOps.Buffer(k)

  override def update(buf: KmvOps.Buffer, input: InternalRow): KmvOps.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(XxHash64Function.hash(v, child.dataType, 42L))
    buf
  }

  override def merge(a: KmvOps.Buffer, b: KmvOps.Buffer): KmvOps.Buffer = {
    val it = b.set.iterator()
    while (it.hasNext) a.insert(it.next().longValue())
    a
  }

  override def eval(buf: KmvOps.Buffer): Any = KmvOps.serialize(buf)

  override def serialize(buf: KmvOps.Buffer): Array[Byte] = KmvOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): KmvOps.Buffer =
    KmvOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(off: Int): KmvSketchBuild =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): KmvSketchBuild =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchBuild =
    copy(child = newChildren.head)
}

object KmvSketchBuild {
  def apply(c: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      KmvSketchBuild(org.apache.spark.sql.graft.ColumnBridge.expression(c), k)
        .toAggregateExpression())
  def apply(c: Column): Column = apply(c, 1024)
}

/** Merge two KMV sketch byte columns (strict nulls, like hll_union). */
case class KmvUnion(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_union expects (binary, binary), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    KmvOps.union(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.KmvOps.union($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvUnion =
    copy(left = newLeft, right = newRight)
}

object KmvUnion {
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(KmvUnion(
      org.apache.spark.sql.graft.ColumnBridge.expression(a),
      org.apache.spark.sql.graft.ColumnBridge.expression(b)))
}

/** Distinct-cardinality estimate of a KMV sketch column. */
case class KmvEstimate(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_estimate expects binary, got ${child.dataType}")

  override protected def nullSafeEval(bytes: Any): Any =
    KmvOps.estimate(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b =>
      s"graft.functions.expressions.KmvOps.estimate($b)")

  override protected def withNewChildInternal(newChild: Expression): KmvEstimate =
    copy(child = newChild)
}

object KmvEstimate {
  def apply(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      KmvEstimate(org.apache.spark.sql.graft.ColumnBridge.expression(c)))
}

/** Distinct-INTERSECTION estimate of two KMV sketch columns — the
  * operation that justifies the family. */
case class KmvIntersect(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_intersect expects (binary, binary), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    KmvOps.intersect(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.KmvOps.intersect($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvIntersect =
    copy(left = newLeft, right = newRight)
}

object KmvIntersect {
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(KmvIntersect(
      org.apache.spark.sql.graft.ColumnBridge.expression(a),
      org.apache.spark.sql.graft.ColumnBridge.expression(b)))
}

/** Aggregate a STRING column into md5-40 KMV sketch bytes — the
  * exact-gate twin of [[KmvSketchBuild]] (see KmvOps' md5-40 notes). */
case class KmvSketchBuildMd5(
    child: Expression,
    k: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvOps.Buffer] {

  require(k >= 8 && k <= (1 << 20), s"k must be in [8, 2^20], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch_md5 expects string, got ${child.dataType}")

  override def createAggregationBuffer(): KmvOps.Buffer = new KmvOps.Buffer(k)

  override def update(buf: KmvOps.Buffer, input: InternalRow): KmvOps.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(KmvOps.md5Hash40(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes))
    buf
  }

  override def merge(a: KmvOps.Buffer, b: KmvOps.Buffer): KmvOps.Buffer = {
    val it = b.set.iterator()
    while (it.hasNext) a.insert(it.next().longValue())
    a
  }

  override def eval(buf: KmvOps.Buffer): Any = KmvOps.serialize(buf)

  override def serialize(buf: KmvOps.Buffer): Array[Byte] = KmvOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): KmvOps.Buffer =
    KmvOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(off: Int): KmvSketchBuildMd5 =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): KmvSketchBuildMd5 =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchBuildMd5 =
    copy(child = newChildren.head)
}

object KmvSketchBuildMd5 {
  def apply(c: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      KmvSketchBuildMd5(org.apache.spark.sql.graft.ColumnBridge.expression(c), k)
        .toAggregateExpression())
  def apply(c: Column): Column = apply(c, 1024)
}

/** Integer distinct-cardinality estimate of an md5-40 KMV sketch. */
case class KmvEstimateFp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_estimate_fp expects binary, got ${child.dataType}")

  override protected def nullSafeEval(bytes: Any): Any =
    KmvOps.estimate40(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b =>
      s"graft.functions.expressions.KmvOps.estimate40($b)")

  override protected def withNewChildInternal(newChild: Expression): KmvEstimateFp =
    copy(child = newChild)
}

object KmvEstimateFp {
  def apply(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      KmvEstimateFp(org.apache.spark.sql.graft.ColumnBridge.expression(c)))
}

/** Integer distinct-intersection estimate of two md5-40 KMV sketches. */
case class KmvIntersectFp(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_intersect_fp expects (binary, binary), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    KmvOps.intersect40(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.KmvOps.intersect40($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvIntersectFp =
    copy(left = newLeft, right = newRight)
}

object KmvIntersectFp {
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(KmvIntersectFp(
      org.apache.spark.sql.graft.ColumnBridge.expression(a),
      org.apache.spark.sql.graft.ColumnBridge.expression(b)))
}
