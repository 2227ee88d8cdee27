package graft.functions.expressions

/** Morton (Z-order) bit interleaving over 16-bit lanes — the math
  * under [[ZOrderCode]]. Interleaving the bits of d normalized
  * dimensions makes points close in ALL dimensions close in the
  * single sort key, so sorting a file layout by the z-value gives
  * every dimension usable parquet min/max stats (multi-column data
  * skipping), where a lexicographic sort gives them only to its
  * leading column. Inputs are clamped to [0, 65535]: the caller
  * normalizes (Layouts.zorderColumn), and out-of-range garbage must
  * not silently alias to a far-away cell.
  */
object ZOrderOps {

  private def clamp(v: Int): Long =
    (if (v < 0) 0 else if (v > 0xFFFF) 0xFFFF else v).toLong

  /** Spread 16 bits to even positions (0,2,4,...,30). */
  private def spread2(v0: Long): Long = {
    var v = v0
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  /** Spread 16 bits to every stride-th position (stride 3 or 4). */
  private def spreadN(v: Long, stride: Int): Long = {
    var out = 0L
    var i = 0
    while (i < 16) {
      out |= ((v >>> i) & 1L) << (i * stride)
      i += 1
    }
    out
  }

  def z2(a: Int, b: Int): Long =
    spread2(clamp(a)) | (spread2(clamp(b)) << 1)

  def z3(a: Int, b: Int, c: Int): Long =
    spreadN(clamp(a), 3) | (spreadN(clamp(b), 3) << 1) |
      (spreadN(clamp(c), 3) << 2)

  def z4(a: Int, b: Int, c: Int, d: Int): Long =
    spreadN(clamp(a), 4) | (spreadN(clamp(b), 4) << 1) |
      (spreadN(clamp(c), 4) << 2) | (spreadN(clamp(d), 4) << 3)
}
