package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact integer fixed-point numerics shared by the hash-gated
  * operator families (the `embed_ann_ivf_fp` / `bm25_search_fp`
  * discipline): every op here is BIGINT add/mul/shift/floor-div with a
  * character-identical DuckDB mirror, so pipelines built on them are
  * bit-deterministic under any partitioning, engine, or merge order —
  * no libm anywhere.
  *
  * The workhorse is [[log2LinFp]], a linearly-interpolated base-2 log
  * at 2^20 scale: `log2fp(x) = il·S + ((x·S) >> il) − S` with
  * `il = ⌊log2 x⌋` read off the binary-string length (`bin()` in both
  * engines — exact, unlike `floor(log2(x))` which can flip at powers
  * of two if libm returns k−ε). Within an octave the value is linear
  * in x; at octave edges it is exactly `k·S`; it is strictly monotone
  * over x ≥ 1. Max error vs true log2 is ~0.086 bits (at x = e/2·2^k)
  * — irrelevant for ranking/filtering, which only need a monotone,
  * engine-portable surrogate.
  *
  * Operand bound: `x·S` must stay inside int64, so x ≤ 2^43 (≈8.8e12).
  * Token/bigram counts of a ~100 TB corpus approach that bound —
  * rescale S down (it is a plain constant) if a corpus constant check
  * at build time finds N·4 > 2^43, the `bm25_search_fp` treatment.
  */
object FixedPointOps {

  /** Fixed-point scale: 2^20, the repo-wide convention. */
  val FpScale: Long = 1L << 20

  /** ⌊log2 x⌋ for x ≥ 1, exactly, via the binary digit count.
    * DuckDB mirror: `length(bin(x)) - 1`. */
  def ilog2(x: Column): Column = (length(bin(x)) - lit(1)).cast("long")

  /** Linearly-interpolated log2 at 2^20 fixed point (see object doc).
    * Caller contract: 1 ≤ x ≤ 2^43. */
  def log2LinFp(x: Column): Column = {
    val il = ilog2(x)
    il * lit(FpScale) +
      call_function("shiftright", x * lit(FpScale), il.cast("int")) -
      lit(FpScale)
  }

  /** DuckDB SQL fragment computing [[log2LinFp]] of expression `x`
    * (x is substituted three times — pass a simple column/expr). */
  def log2LinFpSql(x: String): String =
    s"(CAST(length(bin(CAST(($x) AS BIGINT))) - 1 AS BIGINT) * 1048576" +
      s" + ((CAST(($x) AS BIGINT) * 1048576) >> (length(bin(CAST(($x) AS BIGINT))) - 1))" +
      s" - 1048576)"
}
