package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join: point-in-interval joins as EQUI-joins.
  *
  * Spark plans a raw `t BETWEEN start AND end` join as
  * BroadcastNestedLoopJoin (or a per-key cartesian) — probe×build work
  * that does not survive scale. Discretizing time into fixed bins
  * turns it into a shuffle-hash equi-join: each interval explodes to
  * the bins it covers, each probe row maps to its single bin, the join
  * runs on (key, bin), and an exact predicate filters the candidates.
  * Candidate work is O(probes + intervals × bins-per-interval) — the
  * standard trick for interval/spatial joins at 100 TB (pick the bin
  * size near the typical interval length so intervals explode to O(1)
  * bins).
  */
object RangeJoin {

  /** Join probe rows `(key, tsCol)` to build intervals
    * `(key, startCol, endCol)` with `start <= ts < end`.
    * Output = probe columns + the build side's columns. */
  def binned(probe: DataFrame, build: DataFrame, key: String,
             tsCol: String, startCol: String, endCol: String,
             binMicros: Long): DataFrame = {
    val pb = probe.withColumn("bin",
      floor(unix_micros(col(tsCol)) / lit(binMicros)))
    // end is exclusive, but an interval touching a bin boundary still
    // covers that bin's start — sequence over floor(start)..floor(end)
    val bb = build.withColumn("bin", explode(sequence(
      floor(unix_micros(col(startCol)) / lit(binMicros)),
      floor(unix_micros(col(endCol)) / lit(binMicros)))))
    pb.join(bb, Seq(key, "bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("bin")
  }

  /** Epoch-micros variant with a caller-supplied exact predicate
    * (open/closed bounds differ per use — a trailing attribution
    * window is `(hi - span, hi]`, the interval join above is
    * `[start, end)`). Probe rows carry a BIGINT micros column
    * `tsUsCol`; each build row covers `[loUsCol, hiUsCol]` micros.
    * Bins are BIGINT `div` (exact — float `floor(x/y)` can flip at
    * exact multiples; timestamps are assumed non-negative), so both
    * sides land in consistent bins and the exact filter only ever
    * REMOVES candidates, never needs one the binning dropped.
    *
    * Scale shape: the build side explodes to its covered bins
    * (O(span/binMicros) rows each — pick binMicros near the span so
    * that's O(1)); the probe maps to ONE bin; the join is a plain
    * (key, bin) equi-join, so per-build-row candidate fan-out is
    * bounded by the probe rows in its covered bins — never the key's
    * lifetime history. That bound is what retires the
    * join-then-range-filter scale cliff (PlanAudit's
    * crossSideRangeFilterJoins smell) for any history length. */
  def binnedUs(probe: DataFrame, build: DataFrame, key: String,
               tsUsCol: String, loUsCol: String, hiUsCol: String,
               binMicros: Long, exact: Column): DataFrame = {
    val pb = probe.withColumn("bin", expr(s"$tsUsCol div ${binMicros}L"))
    val bb = build.withColumn("bin", explode(sequence(
      expr(s"$loUsCol div ${binMicros}L"),
      expr(s"$hiUsCol div ${binMicros}L"))))
    pb.join(bb, Seq(key, "bin")).filter(exact).drop("bin")
  }
}
