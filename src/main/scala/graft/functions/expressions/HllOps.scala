package graft.functions.expressions

/** Shared HyperLogLog math: register update, sketch union, and the
  * estimator (Flajolet et al., with linear counting below 2.5m). The
  * sketch FORMAT is the raw register array (`m = 2^p` bytes), so
  * union is elementwise max — associative, commutative, idempotent —
  * which is what makes a persisted sketch column mergeable across
  * micro-batches, days, and tables without recounting anything. */
object HllOps {

  /** Fold one xxhash64 value into the register array in place. */
  def update(buf: Array[Byte], h: Long): Unit = {
    val p = Integer.numberOfTrailingZeros(buf.length)
    val idx = (h >>> (64 - p)).toInt
    val suffix = h << p
    val rank = (if (suffix == 0L) 64 - p
      else java.lang.Long.numberOfLeadingZeros(suffix)) + 1
    val r = math.min(rank, 64 - p + 1)
    if (buf(idx) < r) buf(idx) = r.toByte
  }

  /** Elementwise-max union into a FRESH array (codegen-callable). */
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length,
      s"cannot union sketches of different precision: ${a.length} vs ${b.length}")
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) {
      out(i) = if (a(i) >= b(i)) a(i) else b(i)
      i += 1
    }
    out
  }

  /** In-place union (aggregation buffers). */
  def unionInto(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** Cardinality estimate from a register array. */
  def estimate(buf: Array[Byte]): Long = {
    val m = buf.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += math.pow(2.0, -buf(i).toDouble)
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / sum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.round(est)
  }
}
