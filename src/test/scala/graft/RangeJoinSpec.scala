package graft

import graft.operators.RangeJoin
import org.scalatest.funsuite.AnyFunSuite

/** Binned range join boundary semantics: inclusive start, exclusive
  * end, intervals spanning multiple bins, per-key isolation. */
class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def t(minute: Int) = java.sql.Timestamp.valueOf(
    f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("boundaries, multi-bin intervals and key isolation") {
    import spark.implicits._
    // interval [00:10, 01:40) for key 1 spans four 30-min bins
    val build = Seq((1L, t(10), t(100)), (2L, t(0), t(30)))
      .toDF("k", "start", "end")
    val probe = Seq(
      (101L, 1L, t(10)),  // == start → included
      (102L, 1L, t(99)),  // just inside a later bin → included
      (103L, 1L, t(100)), // == end → excluded
      (104L, 1L, t(5)),   // before start, same bin → excluded
      (105L, 2L, t(15)),  // key 2's interval → pairs with key 2 only
      (106L, 3L, t(15)))  // key with no interval
      .toDF("id", "k", "ts")
    val got = RangeJoin.binned(probe, build, "k", "ts", "start", "end",
      binMicros = 1800000000L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(101L, 102L, 105L))
  }
}
