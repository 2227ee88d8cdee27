package graft

import graft.operators.AsOf
import org.scalatest.funsuite.AnyFunSuite

/** As-of join semantics: inclusive match, no future leakage, tie-break
  * determinism. */
class AsOfSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def ts(minute: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("probe picks the latest build row at or before its time") {
    import spark.implicits._
    val probe = Seq((1L, 10L, ts(5)), (1L, 11L, ts(9)), (2L, 12L, ts(5)))
      .toDF("k", "pid", "pt")
    val build = Seq((1L, 100L, ts(2)), (1L, 101L, ts(7)), (2L, 102L, ts(6)))
      .toDF("k", "bid", "bt")
    val out = AsOf.join(probe, build, "k", "pt", "bt", "pid", "bid", Seq("bid"))
      .collect().map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    assert(out == Map(
      10L -> Some(100L), // t=5: sees build at 2, not 7
      11L -> Some(101L), // t=9: sees build at 7
      12L -> None))      // t=5: build for key 2 is at 6 → future → none
  }

  test("equal timestamps: probe sees the build row (inclusive), highest tie wins") {
    import spark.implicits._
    val probe = Seq((1L, 10L, ts(5))).toDF("k", "pid", "pt")
    val build = Seq((1L, 100L, ts(5)), (1L, 101L, ts(5))).toDF("k", "bid", "bt")
    val out = AsOf.join(probe, build, "k", "pt", "bt", "pid", "bid", Seq("bid"))
      .collect()
    assert(out.head.getLong(3) == 101L) // deterministic: max tie at equal time
  }
}
