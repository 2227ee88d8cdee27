package graft.operators

import org.apache.spark.sql.DataFrame
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
}
