package graft.functions.expressions

import scala.collection.mutable

/** Log-bucketed relative-error quantile sketch math (the DDSketch
  * construction — Masson, Lee & Khelif, "DDSketch: A Fast and Fully-
  * Mergeable Quantile Sketch with Relative-Error Guarantees",
  * VLDB 2019). Values bucket at geometric boundaries gamma^i with
  * gamma = (1+alpha)/(1-alpha), so the bucket midpoint is within
  * relative error alpha of every value it holds; counts per bucket
  * are the whole state.
  *
  * Why this sketch and not GK / KLL / t-digest for the PERSISTED
  * column family: its merge is bucket-wise count ADDITION —
  * associative, commutative, and exact — so the final state is
  * independent of Spark's partial-aggregation merge order, and a
  * canonically-serialized sketch column is BIT-DETERMINISTIC across
  * runs, partitionings, and batch/streaming execution. (KLL's
  * compaction and t-digest's centroid drift are merge-order-
  * sensitive; GK doesn't merge cleanly at all.) That determinism is
  * what lets StreamingQuantileSpec assert streaming-maintained bytes
  * EQUAL the batch-built bytes, the same contract the HLL column
  * family ([[HllOps]]) gives distinct-counts.
  *
  * State: zero count + two sparse (bucket -> count) maps, one per
  * sign. NaN inputs are ignored (like nulls — no rank to assign).
  * Each store is capped at [[QuantileOps.MaxBuckets]] buckets, but the
  * cap is enforced ONLY at the read/serialize boundary (canonicalize):
  * insert and merge stay pure bucket addition, so the accumulated
  * bucket multiset — and therefore the canonical fold over its SORTED
  * key set — is independent of insertion and merge order even in the
  * overflow regime. (A mid-merge collapse would make the surviving
  * bucket set order-dependent, breaking the bit-determinism contract
  * exactly when it silently degrades.) In-memory growth is
  * intrinsically bounded: double's finite exponent range caps bucket
  * indexes at ~±log_gamma(MaxDouble) (~35,400 per sign at alpha=0.01
  * — a few MB worst case, unreachable in practice). The fold policy
  * collapses the LOWEST-magnitude buckets into one (the paper's
  * policy: high quantiles, the ones ops care about, keep full
  * accuracy); with alpha=0.01 the cap spans gamma^4096 ~ 1e36, so the
  * fold is a safety rail, not an expected path.
  */
object QuantileOps {

  val Magic: Byte = 0x51 // 'Q'
  val Version: Byte = 1
  val MaxBuckets = 4096

  final class State(val alpha: Double) {
    require(alpha > 0.0 && alpha < 0.5, s"alpha must be in (0, 0.5), got $alpha")
    val gamma: Double = (1.0 + alpha) / (1.0 - alpha)
    private val logGamma: Double = math.log(gamma)

    var zero: Long = 0L
    val pos: mutable.LongMap[Long] = mutable.LongMap.empty
    val neg: mutable.LongMap[Long] = mutable.LongMap.empty

    def bucketOf(x: Double): Int = math.ceil(math.log(x) / logGamma).toInt

    /** Bucket midpoint in log space: within alpha of any x it holds. */
    def valueOf(idx: Long): Double =
      2.0 * math.pow(gamma, idx.toDouble) / (gamma + 1.0)

    def insert(x: Double): Unit =
      if (!x.isNaN) {
        if (x == 0.0) zero += 1
        else if (x > 0.0) bump(pos, bucketOf(x), 1L)
        else bump(neg, bucketOf(-x), 1L)
      }

    private def bump(store: mutable.LongMap[Long], idx: Long, n: Long): Unit =
      store(idx) = store.getOrElse(idx, 0L) + n

    /** Enforce the bucket cap — called ONLY at the read/serialize
      * boundary so accumulation stays pure addition (see class doc).
      * pos indexes grow with VALUE, neg indexes grow with MAGNITUDE:
      * folding the lowest pos buckets sacrifices the low quantiles,
      * but for neg the low-index buckets are the values NEAREST ZERO
      * — the distribution's HIGH quantiles — so neg folds from the
      * highest index (the extreme negative tail) to keep the same
      * policy on both sides: overflow degrades the LOW-quantile tail,
      * never the high quantiles. */
    def canonicalize(): Unit = {
      collapse(pos, foldLowest = true)
      collapse(neg, foldLowest = false)
    }

    /** Fold one end's buckets together until within cap (see
      * canonicalize for which end and why). Deterministic: a pure
      * function of the store's key/count set. */
    private def collapse(store: mutable.LongMap[Long], foldLowest: Boolean): Unit = {
      if (store.size <= MaxBuckets) return
      val keys = store.keys.toArray.sorted
      val order = if (foldLowest) keys else keys.reverse
      var i = 0
      var folded = 0L
      while (store.size > MaxBuckets) { // each removal shrinks size by 1
        folded += store(order(i))
        store.remove(order(i))
        i += 1
      }
      store(order(i)) = store.getOrElse(order(i), 0L) + folded
    }

    def total: Long =
      zero + pos.valuesIterator.sum + neg.valuesIterator.sum

    def mergeIn(other: State): State = {
      require(alpha == other.alpha,
        s"cannot union quantile sketches of different alpha: $alpha vs ${other.alpha}")
      zero += other.zero
      other.pos.foreach { case (k, v) => bump(pos, k, v) }
      other.neg.foreach { case (k, v) => bump(neg, k, v) }
      this
    }

    /** Quantile estimate at q in [0,1]; NaN on an empty sketch.
      * Rank convention: the value whose 0-indexed rank is
      * floor(q * (n - 1)) — the nearest-rank form `percentile_cont`
      * collapses to when neighbors share a bucket. */
    def quantile(q: Double): Double = {
      canonicalize() // reads see exactly what serialize() would persist
      val n = total
      if (n == 0L) return Double.NaN
      val rank = math.min((q * (n - 1).toDouble).toLong, n - 1)
      var c = 0L
      // negatives first, most negative (largest |x| bucket) to least
      val negKeys = neg.keys.toArray.sorted
      var i = negKeys.length - 1
      while (i >= 0) {
        c += neg(negKeys(i))
        if (c > rank) return -valueOf(negKeys(i))
        i -= 1
      }
      c += zero
      if (c > rank) return 0.0
      val posKeys = pos.keys.toArray.sorted
      i = 0
      while (i < posKeys.length) {
        c += pos(posKeys(i))
        if (c > rank) return valueOf(posKeys(i))
        i += 1
      }
      // rank <= n-1 and the cumulative count reaches n inside the
      // last non-empty store, so control cannot get here
      throw new IllegalStateException("unreachable: rank below total")
    }

    /** Canonical bytes: header + both stores with SORTED keys, so
      * equal states serialize identically regardless of insertion
      * or merge order. */
    def serialize(): Array[Byte] = {
      canonicalize()
      val negKeys = neg.keys.toArray.sorted
      val posKeys = pos.keys.toArray.sorted
      val bb = java.nio.ByteBuffer.allocate(
        2 + 8 + 8 + 4 + 4 + 12 * (negKeys.length + posKeys.length))
      bb.put(Magic).put(Version)
      bb.putDouble(alpha)
      bb.putLong(zero)
      bb.putInt(negKeys.length)
      bb.putInt(posKeys.length)
      negKeys.foreach { k => bb.putInt(k.toInt); bb.putLong(neg(k)) }
      posKeys.foreach { k => bb.putInt(k.toInt); bb.putLong(pos(k)) }
      bb.array()
    }
  }

  def deserialize(bytes: Array[Byte]): State = {
    require(bytes.length >= 26, s"quantile sketch too short: ${bytes.length} bytes")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val magic = bb.get()
    val version = bb.get()
    require(magic == Magic && version == Version,
      s"not a v$Version quantile sketch (magic=$magic version=$version)")
    val st = new State(bb.getDouble())
    st.zero = bb.getLong()
    val nNeg = bb.getInt()
    val nPos = bb.getInt()
    var i = 0
    while (i < nNeg) { val k = bb.getInt(); st.neg(k.toLong) = bb.getLong(); i += 1 }
    i = 0
    while (i < nPos) { val k = bb.getInt(); st.pos(k.toLong) = bb.getLong(); i += 1 }
    st
  }

  /** Codegen-callable scalar union (fresh bytes). */
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    deserialize(a).mergeIn(deserialize(b)).serialize()

  /** Codegen-callable quantile read of a sketch column; null (boxed)
    * on an empty sketch so SQL sees a proper NULL, not NaN. */
  def value(bytes: Array[Byte], q: Double): java.lang.Double = {
    val est = deserialize(bytes).quantile(q)
    if (est.isNaN) null else java.lang.Double.valueOf(est)
  }
}
