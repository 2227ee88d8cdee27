package graft

import graft.sources.Tables
import graft.streaming.PitFeatureStream
import graft.streaming.PitFeatureStream.PitExample
import graft.streaming.EventPipeline.EventRow
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming PIT examples vs the oracled batch query: an in-order
  * feed must produce exactly pit_features' rows — the emit-before-
  * update fold IS the exclusive-bound window, and the integer-micros
  * spend state must reproduce the batch DECIMAL sums bit-for-bit
  * across arbitrary batch boundaries.
  */
class StreamingPitSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(batches: Seq[Seq[EventRow]], name: String): Seq[PitExample] = {
    import spark.implicits._
    val ms = MemoryStream[EventRow](spark)
    val q = PitFeatureStream.examples(spark, ms.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[PitExample].collect().toSeq
  }

  test("in-order chunked feed emits exactly the batch pit_features rows") {
    import spark.implicits._
    val events = Tables.events(spark, sf).as[EventRow].collect()
      .sortBy(e => (e.ts.getTime, e.event_id)).toSeq
    // uneven chunking exercises cross-batch state carry
    val sizes = Seq(events.length / 5, events.length / 2,
      events.length - events.length / 5 - events.length / 2)
    val batches = {
      var rest = events
      sizes.map { n => val (a, b) = rest.splitAt(n); rest = b; a }
    }
    val streamed = run(batches, "pit_stream")
      .map(e => (e.click_id, e.user_id, e.n_events_before,
        e.n_purchases_before, e.n_errors_before, e.spend_before)).toSet
    val batch = SparkEntry.queries("pit_features")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(streamed == batch,
      s"stream must equal batch: only-stream=${(streamed -- batch).take(3)}, " +
        s"only-batch=${(batch -- streamed).take(3)}")
  }

  test("emit-before-update: a click and its same-batch purchase cannot leak") {
    val mk = (id: Long, typ: String, min: Int, v: Double) =>
      EventRow(id, java.sql.Timestamp.valueOf(f"2024-02-01 00:$min%02d:00"),
        9L, typ, v, "{}")
    val got = run(Seq(Seq(
      mk(1, "purchase", 1, 5.0),
      mk(2, "click", 2, 0.0),   // sees 1 purchase, 5.0
      mk(3, "purchase", 3, 7.0),
      mk(4, "click", 4, 0.0))), // sees 2 purchases, 12.0
      "pit_leak")
    val byId = got.map(e => e.click_id -> e).toMap
    assert(byId(2L).n_purchases_before == 1 && byId(2L).spend_before == 5.0)
    assert(byId(4L).n_purchases_before == 2 && byId(4L).spend_before == 12.0)
    assert(byId(2L).n_events_before == 1 && byId(4L).n_events_before == 3)
  }

  test("state bound MEASURED: one row per distinct user, flat across batches and replays") {
    import spark.implicits._
    val events = Tables.events(spark, sf).as[EventRow].collect()
      .sortBy(e => (e.ts.getTime, e.event_id)).toSeq
    val chunks = events.grouped(events.length / 3 + 1).toSeq
    val ms = MemoryStream[EventRow](spark)
    val q = PitFeatureStream.examples(spark, ms.toDS())
      .writeStream.format("memory").queryName("pit_state_bound")
      .outputMode("append").start()
    try {
      var seen = Set.empty[Long]
      chunks.foreach { c =>
        ms.addData(c); q.processAllAvailable()
        seen ++= c.map(_.user_id)
        val rows = q.lastProgress.stateOperators(0).numRowsTotal
        assert(rows == seen.size,
          s"state rows $rows must equal distinct users ${seen.size} — " +
            "the documented O(users) bound, not O(events)")
      }
      ms.addData(chunks.head); q.processAllAvailable()
      assert(q.lastProgress.stateOperators(0).numRowsTotal == seen.size,
        "re-fed users must not grow the state store")
    } finally q.stop()
  }
}
