package graft

import graft.operators.Windowed
import graft.streaming.EventPipeline.EventRow
import org.scalatest.funsuite.AnyFunSuite

/** Circuit breaker + grant CDC, mirroring
  * tests/test_user_feature_service.py: breaker opens at 6% denial
  * (:27-54), stays closed at the 5% threshold boundary (strict >,
  * user_feature.py:123). Event-time windows replace freezegun. */
class WindowedSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def ev(id: Long, user: Long, typ: String, minute: Int): EventRow =
    EventRow(id, java.sql.Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"),
      user, typ, 1.0, "{}")

  test("breaker opens above 5% denial rate, not at exactly 5%") {
    import spark.implicits._
    // 100 accesses in the [00:00, 00:10) window: 6 denials → 6% → open
    val open = (1 to 94).map(i => ev(i, i, "view", 3)) ++
      (95 to 100).map(i => ev(i, i, "error", 3))
    val openRows = Windowed.circuit(open.toDF()).collect()
      .filter(_.getTimestamp(0).toString.startsWith("2024-01-01 00:00"))
    assert(openRows.length == 1 && openRows.head.getBoolean(4))

    // exactly 5% → strictly-greater comparison keeps it closed
    val closed = (1 to 95).map(i => ev(i, i, "view", 3)) ++
      (96 to 100).map(i => ev(i, i, "error", 3))
    val closedRows = Windowed.circuit(closed.toDF()).collect()
      .filter(_.getTimestamp(0).toString.startsWith("2024-01-01 00:00"))
    assert(closedRows.length == 1 && !closedRows.head.getBoolean(4))
  }

  test("sliding windows count each event in two 10-minute windows") {
    import spark.implicits._
    val rows = Windowed.slidingStats(Seq(ev(1, 1, "view", 7)).toDF()).collect()
    // minute 7 lands in windows starting 00:00 and 00:05
    assert(rows.map(_.getTimestamp(0).toString).sorted.toSeq ==
      Seq("2024-01-01 00:00:00.0", "2024-01-01 00:05:00.0"))
  }

  test("grant flips are emitted only on state change") {
    import spark.implicits._
    val events = Seq(
      ev(1, 7, "purchase", 1).copy(value = 100.0),
      ev(2, 7, "error", 2).copy(value = 150.0), // ratio 1.5 → revoke
      ev(3, 7, "error", 3).copy(value = 10.0),  // still revoked → no flip
      ev(4, 7, "purchase", 4).copy(value = 900.0)) // ratio 0.16 → grant
    val flips = Windowed.grantFlips(events.toDF()).collect()
    assert(flips.map(r => (r.getLong(1), r.getBoolean(3))).toSeq ==
      Seq((2L, false), (4L, true)))
  }
}
