package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter bit-array primitives shared by the aggregate (build
  * side) and the membership probe (scan side). Kirsch–Mitzenmacher
  * double hashing: k probe positions derive from TWO 64-bit hashes as
  * `h1 + i·h2`, which preserves the classic false-positive bound with
  * two hash evaluations per key instead of k (Kirsch & Mitzenmacher,
  * "Less Hashing, Same Performance"). The mixer is splitmix64 — the
  * probe and the builder only need to agree with EACH OTHER, not with
  * any external hash.
  *
  * Static, primitive-typed, and allocation-free so generated code can
  * call straight into it from the scan's hot loop.
  */
object BloomOps {
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  def hash1(v: Long): Long = mix(v)
  def hash2(v: Long): Long = mix(v ^ 0xC2B2AE3D27D4EB4FL) | 1L // odd: full-period stepping

  def put(bits: Array[Byte], v: Long, k: Int): Unit = {
    val h1 = hash1(v); val h2 = hash2(v)
    val n = bits.length.toLong * 8L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, n)
      bits((pos >>> 3).toInt) = (bits((pos >>> 3).toInt) | (1 << (pos & 7L).toInt)).toByte
      i += 1
    }
  }

  def mightContain(bits: Array[Byte], v: Long, k: Int): Boolean = {
    val h1 = hash1(v); val h2 = hash2(v)
    val n = bits.length.toLong * 8L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, n)
      if ((bits((pos >>> 3).toInt) & (1 << (pos & 7L).toInt)) == 0) return false
      i += 1
    }
    true
  }

  /** Byte 0 of a FINISHED filter (the aggregate's output) carries its
    * own probe count k, so a filter built with any k probes correctly —
    * a k mismatch between build and probe sides would produce silent
    * FALSE NEGATIVES (dropped joining rows). The raw put/mightContain
    * above operate on headerless partial buffers inside the aggregate;
    * everything outside the aggregate sees only the headered form.
    *
    * k ≤ 16 fits in the header byte's low 5 bits, so the high 3 bits
    * are a magic/version marker: a probe against bytes that bloom_agg
    * did not produce (empty binary, truncated filter, arbitrary blob
    * whose byte 0 happens to look like a k) must fail fast with a
    * bloom-specific message, not an ArrayIndexOutOfBounds/divide-by-
    * zero deep inside the codegen'd scan loop — or worse, silently
    * misread and drop joining rows.
    *
    * COMPATIBILITY: this magic+k header (version 1) replaced an earlier
    * k-only header byte. Filters are runtime join artifacts — built,
    * broadcast, and dropped within one query — so nothing persists them
    * today; if filter bytes ever outlive a run (e.g. a materialized
    * prefilter table), bytes written under the old header fail probe()'s
    * magic check and must be rebuilt, and any future layout change must
    * bump the version in the high 3 bits. */
  val HeaderBytes = 1
  val HeaderMagicMask = 0xE0
  val HeaderMagic = 0xA0 // version 1 marker in the header's high 3 bits
  private val KMask = 0x1F

  def withHeader(bits: Array[Byte], k: Int): Array[Byte] = {
    require(k >= 1 && k <= 16, s"bloom k must be in [1,16], got $k")
    val out = new Array[Byte](bits.length + HeaderBytes)
    out(0) = (HeaderMagic | k).toByte
    System.arraycopy(bits, 0, out, HeaderBytes, bits.length)
    out
  }

  /** Probe a headered filter: k comes from the filter itself. Rejects
    * bytes that are not a bloom_agg output (too short, or missing the
    * header magic) with a descriptive error — returning false here
    * would be a silent false negative in a join prefilter. */
  def probe(bloom: Array[Byte], v: Long): Boolean = {
    if (bloom.length <= HeaderBytes)
      throw new IllegalArgumentException(
        s"bloom_might_contain: ${bloom.length}-byte input is not a bloom_agg filter")
    val header = bloom(0) & 0xFF
    if ((header & HeaderMagicMask) != HeaderMagic)
      throw new IllegalArgumentException(
        f"bloom_might_contain: bad filter header 0x$header%02x (expected magic " +
          f"0x$HeaderMagic%02x in the high bits) — input was not built by bloom_agg")
    val k = header & KMask
    // withHeader only emits k in [1,16]; 0 (vacuous all-true probe) or
    // 17-31 can only come from bytes that happen to carry the magic
    if (k < 1 || k > 16)
      throw new IllegalArgumentException(
        s"bloom_might_contain: header k=$k out of [1,16] — input was not built by bloom_agg")
    val h1 = hash1(v); val h2 = hash2(v)
    val n = (bloom.length - HeaderBytes).toLong * 8L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, n)
      val b = (pos >>> 3).toInt + HeaderBytes
      if ((bloom(b) & (1 << (pos & 7L).toInt)) == 0) return false
      i += 1
    }
    true
  }

  def unionInto(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length,
      s"bloom size mismatch: ${a.length * 8} vs ${b.length * 8} bits")
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }
}

/** Bloom filter over a LONG key column as a TypedImperativeAggregate —
  * the runtime-join-filter build side. At 100 TB this is the semi-join
  * pushdown every warehouse engine runs: aggregate the (small,
  * post-filter) dim side's join keys into O(bits) fixed state that
  * merges associatively across partitions, broadcast the bytes, and
  * prefilter the fact scan with [[BloomMightContain]] BEFORE the
  * shuffle — rows that cannot join never leave the scan stage. False
  * positives only (no false negatives), so an exact join downstream
  * keeps results exact while the shuffle shrinks by the filter's
  * selectivity. `numBits` defaults to 2^20 (128 KiB — fp ≈ 0.1% at
  * ~10^5 keys with 5 probes; size for n·10 bits per expected key).
  *
  * Reference analogy: the reference has no scale path at all for this
  * (Python dict lookups, services/user_feature.py:22); the Spark-first
  * equivalent of "check membership before expensive work" is exactly a
  * broadcast runtime filter.
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int = 1 << 20,
    numHashes: Int = 5,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(numBits > 0 && numBits % 8 == 0, s"numBits must be a positive multiple of 8, got $numBits")
  require(numHashes >= 1 && numHashes <= 16, s"numHashes must be in [1,16], got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects a BIGINT key, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](numBits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomOps.put(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    BloomOps.unionInto(a, b)

  // partial buffers stay headerless (serialize/deserialize/merge work
  // on the raw bit array); only the FINAL value carries the k header
  override def eval(buf: Array[Byte]): Any = BloomOps.withHeader(buf, numHashes)
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(off: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren.head)
}

object BloomFilterAgg {
  /** Column API: `bloom_agg(key [, numBits, numHashes])`. */
  def apply(c: Column, numBits: Int, numHashes: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      BloomFilterAgg(
        org.apache.spark.sql.graft.ColumnBridge.expression(c),
        numBits, numHashes).toAggregateExpression())
  def apply(c: Column): Column = apply(c, 1 << 20, 5)
}

/** Membership probe against a [[BloomFilterAgg]] filter:
  * `bloom_might_contain(bloom, key)` — false means DEFINITELY absent
  * (safe to drop before the join); true means probably present. NULL
  * key or NULL bloom → NULL (SQL three-valued logic; a NULL join key
  * cannot equi-join anyway). Codegen'd: the scan's hot loop calls the
  * static probe directly, no boxing.
  *
  * The probe count k is read from the filter's own header byte
  * ([[BloomOps.withHeader]]), so a filter built with ANY numHashes
  * probes correctly — there is no k parameter to mismatch.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bloom_might_contain expects (BINARY bloom, BIGINT key), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(bloom: Any, key: Any): Any =
    java.lang.Boolean.valueOf(BloomOps.probe(
      bloom.asInstanceOf[Array[Byte]], key.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bloom, key) =>
      s"${ev.value} = graft.functions.expressions.BloomOps.probe($bloom, $key);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  def apply(bloom: Column, key: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      BloomMightContain(
        org.apache.spark.sql.graft.ColumnBridge.expression(bloom),
        org.apache.spark.sql.graft.ColumnBridge.expression(key)))
}
