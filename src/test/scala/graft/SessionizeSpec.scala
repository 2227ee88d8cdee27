package graft

import graft.streaming.EventPipeline.EventRow
import graft.streaming.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sessionization: closed sessions emitted on watermark
  * pass must equal the batch session_window aggregation. */
class SessionizeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def ev(id: Long, user: Long, minute: Int): EventRow =
    EventRow(id, java.sql.Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00"),
      user, "click", 1.0, "{}")

  // user 1: events at 00:01,00:10 (one session), then 01:00 (a second
  // session after the 30-min gap); user 2: one event
  private val fixture = Seq(
    ev(1, 1, 1), ev(2, 1, 10), ev(3, 1, 60), ev(4, 2, 5))

  test("streaming sessions equal batch sessions once the watermark closes them") {
    import spark.implicits._
    val ms = MemoryStream[EventRow](spark)
    val q = Sessionize.sessions(ms.toDS().toDF())
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      ms.addData(fixture)
      q.processAllAvailable()
      // advance the watermark far past every session close so all emit
      ms.addData(Seq(ev(99, 9, 10 * 60)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sess_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Sessionize.sessions(fixture.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.subsetOf(streamed), s"missing sessions: ${batch -- streamed}")
    // the watermark-advancer's own session is the only extra
    assert((streamed -- batch).forall(_._1 == 9L))
    // shape: user 1 split into two sessions across the 30-min gap
    assert(batch.count(_._1 == 1L) == 2)
  }
}
