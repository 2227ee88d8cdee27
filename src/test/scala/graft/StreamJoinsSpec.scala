package graft

import graft.streaming.StreamJoins
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Watermarked stream-stream interval join: same pairs as the batch
  * range join on the same data, with out-of-lookback and cross-user
  * pairs excluded. */
class StreamJoinsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def t(minute: Int) = java.sql.Timestamp.valueOf(
    f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  // (user_id, purchase_id, ts) / (user_id, click_id, cts)
  private val purchases = Seq((1L, 100L, t(40)), (2L, 200L, t(45)))
  private val clicks = Seq(
    (1L, 11L, t(20)),  // within 30 min of purchase 100 → pair
    (1L, 12L, t(39)),  // within → pair
    (1L, 13L, t(5)),   // 35 min before → outside lookback
    (1L, 14L, t(41)),  // after the purchase → excluded
    (2L, 21L, t(44)),  // within, other user → pairs with 200 only
    (3L, 31L, t(40)))  // no purchase for user 3

  private val expected = Set((100L, 11L), (100L, 12L), (200L, 21L))

  test("streaming interval join emits exactly the batch pairs") {
    import spark.implicits._
    val pm = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val cm = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val joined = StreamJoins.intervalJoin(
      pm.toDF().toDF("user_id", "purchase_id", "ts"),
      cm.toDF().toDF("user_id", "click_id", "cts"),
      "user_id", "ts", "cts")
    val q = joined.select("purchase_id", "click_id")
      .writeStream.format("memory").queryName("attrib_pairs")
      .outputMode("append").start()
    try {
      cm.addData(clicks)
      pm.addData(purchases)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("attrib_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("batch mode through the same operator gives identical pairs") {
    import spark.implicits._
    val got = StreamJoins.intervalJoin(
      purchases.toDF("user_id", "purchase_id", "ts"),
      clicks.toDF("user_id", "click_id", "cts"),
      "user_id", "ts", "cts")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }
}
