package graft

import graft.sources.Tables
import graft.streaming.FunnelStream
import graft.streaming.FunnelStream.FunnelTransition
import graft.streaming.EventPipeline.EventRow
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming funnel tracker vs its batch twin: in-order event feed
  * across micro-batches must converge to batchStages (which itself
  * mirrors the oracled funnel_conversion query), transitions are
  * strictly increasing per user, and completed funnels free state.
  */
object StreamingFunnelSpec {
  /** (batchId, transition) log shared across query incarnations in
    * the recovery test — foreachBatch output survives a restart,
    * unlike a memory sink, which recovery recreates empty (the
    * StreamingRecoverySpec pattern). */
  val transitionLog =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, FunnelStream.FunnelTransition)]()
}

class StreamingFunnelSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def ev(id: Long, user: Long, typ: String, hour: Int, minute: Int = 0,
                 day: Int = 1): EventRow =
    EventRow(id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:$minute%02d:00"),
      user, typ, 1.0, "{}")

  private val fixture = Seq(
    // u1 full conversion inside the windows
    ev(1, 1, "signup", 10), ev(2, 1, "click", 10, 30), ev(3, 1, "purchase", 11),
    // u2: click before signup ignored; later click counts; no purchase
    ev(4, 2, "click", 9), ev(5, 2, "signup", 10), ev(6, 2, "click", 12),
    // u3: click outside the 24h window -> stays stage 1
    ev(7, 3, "signup", 10), ev(8, 3, "click", 11, 0, 3),
    // u4: no signup -> never in the funnel
    ev(9, 4, "click", 10), ev(10, 4, "purchase", 11))

  /** Rows each named run lost to the watermark before they reached
    * the fold, summed across its micro-batches. */
  private val dropLog = scala.collection.concurrent.TrieMap.empty[String, Long]
  private def droppedByWatermark(name: String): Long = dropLog(name)

  private def runStream(batches: Seq[Seq[EventRow]], name: String): Seq[FunnelTransition] = {
    import spark.implicits._
    val ms = MemoryStream[EventRow](spark)
    val q = FunnelStream.transitions(spark, ms.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally {
      dropLog(name) = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      q.stop()
    }
    spark.table(name).as[FunnelTransition].collect().toSeq
  }

  test("transitions match the batch twin; per-user stages strictly increase") {
    import spark.implicits._
    val got = runStream(fixture.grouped(4).toSeq, "funnel_stream")
    // monotone per user, no stage skipped or repeated
    got.groupBy(_.user_id).foreach { case (_, ts) =>
      assert(ts.sortBy(_.at_us).map(_.stage) == (1 to ts.size).toSeq)
    }
    // final reached stage per user == batch twin
    val streamed = got.groupBy(_.user_id).view.mapValues(_.map(_.stage).max).toMap
    val batch = FunnelStream.batchStages(fixture.toDF())
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(streamed == batch)
    assert(batch == Map(1L -> 3, 2L -> 2, 3L -> 1))
    // this feed is NOT globally in-order (fixture order, chunks of
    // 4): u4's day-1 rows arrive after the day-3 click moved the
    // watermark to day 2, so exactly those two rows are dropped
    // before the fold — visible here, and harmless to parity only
    // because u4 never signs up. The drop count is pinned so the
    // late-tolerance contract stays observable (ADVICE r19).
    assert(droppedByWatermark("funnel_stream") == 2L,
      "the two out-of-order u4 rows are the documented watermark drops")
    // stage timestamps agree too (first qualifying event times)
    val sUs = got.filter(_.stage == 1).map(t => t.user_id -> t.at_us).toMap
    val batchS = FunnelStream.batchStages(fixture.toDF())
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sUs == batchS)
  }

  test("driver corpus in-order feed converges to the oracled batch funnel") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val rows = Tables.events(spark, sf).as[EventRow]
      .collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq
    val got = runStream(rows.grouped(rows.size / 3 + 1).toSeq, "funnel_sf")
    val streamed = got.groupBy(_.user_id).view.mapValues(_.map(_.stage).max)
      .toMap
    // the 24 h watermark (an engine-wide contract since the r19
    // reclaim change) silently drops rows >24 h behind the global max
    // event time BEFORE they reach the fold — batch/stream parity on
    // an in-order feed is only meaningful if nothing was dropped, so
    // the drop count is asserted, not assumed (ADVICE r19: make a
    // contract violation observable rather than silent)
    assert(droppedByWatermark("funnel_sf") == 0L,
      "an in-order feed must never lose rows to the watermark")
    val batch = FunnelStream.batchStages(Tables.events(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(streamed == batch)
    // and the aggregated stage counts equal the oracled query's
    val q = SparkEntry.queries("funnel_conversion")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromStream = streamed.groupBy(_._2).view
      .mapValues(_.size.toLong).toMap
    // batch query reports max-stage counts: stage k = users whose max is k
    assert(q == fromStream.map { case (k, v) => k.toLong -> v })
  }

  test("hourly reach rates: chunked transition feed equals the batch series") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val table = "funnel_rates_t"
    FunnelStream.dropRates(spark, table)
    FunnelStream.initRates(spark, table, buckets = 4)
    try {
      val rows = Tables.events(spark, sf).as[EventRow]
        .collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq
      val ms = MemoryStream[EventRow](spark)
      val q = FunnelStream.ratesWriter(
        FunnelStream.transitions(spark, ms.toDS()), table, buckets = 4)
        .queryName("funnel_rates_q").start()
      try rows.grouped(rows.size / 3 + 1).foreach { c =>
        ms.addData(c); q.processAllAvailable()
      } finally q.stop()
      val streamed = FunnelStream.rates(spark, table).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val batch = FunnelStream.batchRates(Tables.events(spark, sf))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch,
        s"rate store must equal the batch series: ${streamed -- batch} / ${batch -- streamed}")
      assert(batch.nonEmpty)
    } finally FunnelStream.dropRates(spark, table)
  }

  test("completed funnels are terminal: no re-entry, O(users) state") {
    import spark.implicits._
    val ms = MemoryStream[EventRow](spark)
    val q = FunnelStream.transitions(spark, ms.toDS())
      .writeStream.format("memory").queryName("funnel_state")
      .outputMode("append").start()
    try {
      ms.addData(fixture)
      q.processAllAvailable()
      val rows = q.lastProgress.stateOperators(0).numRowsTotal
      // exactly one 3-longs state row per user seen — never per event
      assert(rows <= 4, s"state rows $rows must be O(users)")
      // post-completion events from u1 must NOT re-emit — not a
      // purchase (stage already terminal) and not even a fresh signup
      // (the terminal marker blocks re-entry, keeping the stream
      // convergent with the batch twin's single-journey semantics).
      // Day 2 noon: ABOVE the watermark (day-3 max event - 24 h), so
      // the rows reach the fold and it is the marker doing the
      // blocking, not the late-row filter; and far inside the 90-day
      // reclaim horizon, so the state still exists.
      ms.addData(Seq(ev(11, 1, "purchase", 12, 0, 2), ev(12, 1, "signup", 13, 0, 2)))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("funnel_state").as[FunnelTransition].collect()
    assert(emitted.count(t => t.user_id == 1L) == 3,
      "exactly stages 1..3, nothing after completion")
  }

  test("completed-funnel state is reclaimed after the event-time horizon; active users stay") {
    import spark.implicits._
    def at(id: Long, user: Long, typ: String, ts: String): EventRow =
      EventRow(id, java.sql.Timestamp.valueOf(ts), user, typ, 1.0, "{}")
    val ms = MemoryStream[EventRow](spark)
    val q = FunnelStream.transitions(spark, ms.toDS())
      .writeStream.format("memory").queryName("funnel_reclaim")
      .outputMode("append").start()
    try {
      // batch 1: TWENTY completed funnels on day 1, two stage-1-only
      // (ACTIVE) users
      val completed = (1L to 20L).flatMap { u =>
        Seq(at(u * 10 + 1, u, "signup", "2024-01-01 10:00:00"),
          at(u * 10 + 2, u, "click", "2024-01-01 10:30:00"),
          at(u * 10 + 3, u, "purchase", "2024-01-01 11:00:00"))
      }
      ms.addData(completed ++ Seq(
        at(901, 100L, "signup", "2024-01-01 10:00:00"),
        at(902, 101L, "signup", "2024-01-01 10:00:00")))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators(0).numRowsTotal == 22L)
      // batch 2: event time advances past completion + 90 d + the
      // 24 h watermark delay (2024-01-01 + 90 d = 2024-03-31) — the
      // twenty completed rows are reclaimed; the two ACTIVE users and
      // the new arrival are retained. numRowsTotal is bounded by
      // active users, not lifetime users.
      ms.addData(Seq(at(903, 102L, "signup", "2024-04-15 10:00:00")))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators(0).numRowsTotal == 3L,
        s"completed state must be reclaimed: " +
          s"${q.lastProgress.stateOperators(0).numRowsTotal} rows")
      // re-engagement semantics (documented in the scaladoc): a
      // signup beyond the horizon starts a NEW journey for u1 —
      // stage-1 emit, state row re-created
      ms.addData(Seq(at(904, 1L, "signup", "2024-04-15 11:00:00")))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators(0).numRowsTotal == 4L)
    } finally q.stop()
    val got = spark.table("funnel_reclaim").as[FunnelTransition].collect()
    // every completed journey emitted exactly its three stages before
    // reclamation — removal is an act of storage, not of output
    (2L to 20L).foreach { u =>
      assert(got.filter(_.user_id == u).map(_.stage).sorted.toSeq == Seq(1, 2, 3))
    }
    assert(got.filter(_.user_id == 1L).map(_.stage).sorted.toSeq == Seq(1, 1, 2, 3),
      "a post-horizon signup is a new journey (re-engagement), emitting stage 1 once")
  }

  test("fresh event for a long-completed user in the batch whose watermark passed the horizon: no crash") {
    // ADVICE r19 (high): the re-arm at pUs + 90 d used to be
    // unconditional, and GroupStateImpl.setTimeoutTimestamp throws
    // IllegalArgumentException for a timestamp BELOW the current
    // watermark (verified in the shipped 4.1.2 bytecode). New data is
    // processed before timeout eviction within a batch, so a fresh
    // event for a completed user arriving in a batch whose watermark
    // already passed pUs + horizon would kill the query — and since
    // the batch replays from the checkpoint, a poison-pill crash
    // loop. processAllAvailable() normally hides the race by running
    // the no-data timeout batch (which evicts the state) right after
    // every watermark advance; disabling no-data micro-batches models
    // the production schedule where data batches run back-to-back
    // and eviction hasn't happened yet.
    import spark.implicits._
    def at(id: Long, user: Long, typ: String, ts: String): EventRow =
      EventRow(id, java.sql.Timestamp.valueOf(ts), user, typ, 1.0, "{}")
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    val ms = MemoryStream[EventRow](spark)
    val q = FunnelStream.transitions(spark, ms.toDS())
      .writeStream.format("memory").queryName("funnel_rearm_clamp")
      .outputMode("append").start()
    try {
      // batch 1: u1 completes on day 1 — reclaim timer armed at
      // 2024-01-01 11:00 + 90 d = 2024-03-31 11:00
      ms.addData(Seq(
        at(1, 1L, "signup", "2024-01-01 10:00:00"),
        at(2, 1L, "click", "2024-01-01 10:30:00"),
        at(3, 1L, "purchase", "2024-01-01 11:00:00")))
      q.processAllAvailable()
      // batch 2: an unrelated feed jumps max event time to 2024-04-15
      // — after this batch the watermark (max − 24 h = 2024-04-14) is
      // past u1's horizon, but with no-data batches off the timer has
      // NOT fired
      ms.addData(Seq(at(4, 99L, "signup", "2024-04-15 10:00:00")))
      q.processAllAvailable()
      // batch 3: the poison pill — new data for u1 processed with the
      // advanced watermark while the terminal state still exists; the
      // signup is blocked by the marker, and the re-arm must clamp to
      // watermark + 1 instead of throwing
      ms.addData(Seq(at(5, 1L, "signup", "2024-04-15 12:00:00")))
      q.processAllAvailable()
      assert(q.isActive && q.exception.isEmpty,
        s"unclamped re-arm killed the query: ${q.exception}")
      // the clamped timer fires on the next watermark advance: the
      // reclaim is deferred to the first opportunity, never lost
      ms.addData(Seq(at(6, 99L, "click", "2024-04-16 10:00:00")))
      q.processAllAvailable()
      ms.addData(Seq(at(7, 99L, "purchase", "2024-04-16 11:00:00")))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators(0).numRowsTotal <= 2L,
        "deferred reclaim must still evict u1's terminal marker")
    } finally {
      q.stop()
      spark.conf.set(key, prev)
    }
    val got = spark.table("funnel_rearm_clamp").as[FunnelTransition].collect()
    assert(got.filter(_.user_id == 1L).map(_.stage).sorted.toSeq == Seq(1, 2, 3),
      "the in-horizon post-completion signup must stay blocked by the marker")
  }

  test("checkpoint restart: terminal markers and the reclaim timer survive recovery") {
    import spark.implicits._
    def at(id: Long, user: Long, typ: String, ts: String): EventRow =
      EventRow(id, java.sql.Timestamp.valueOf(ts), user, typ, 1.0, "{}")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_funnel_ckpt_").toString
    StreamingFunnelSpec.transitionLog.clear()
    val ms = MemoryStream[EventRow](spark)
    def startQ() = FunnelStream.transitions(spark, ms.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[FunnelTransition], id: Long) =>
        b.collect().foreach(t => StreamingFunnelSpec.transitionLog.add((id, t)))
        ()
      }
      .queryName("funnel_rec").start()
    try {
      // incarnation 1: u1 completes on day 1 (arming its reclaim
      // timer), u2 stays active at stage 1 — then STOP
      val q1 = startQ()
      try {
        ms.addData(Seq(
          at(1, 1L, "signup", "2024-01-01 10:00:00"),
          at(2, 1L, "click", "2024-01-01 10:30:00"),
          at(3, 1L, "purchase", "2024-01-01 11:00:00"),
          at(4, 2L, "signup", "2024-01-01 10:00:00")))
        q1.processAllAvailable()
      } finally q1.stop()

      // incarnation 2, same checkpoint: the RESTORED terminal marker
      // must still block an in-horizon signup, and the RESTORED timer
      // must still fire once event time passes the horizon
      val q2 = startQ()
      try {
        ms.addData(Seq(at(5, 1L, "signup", "2024-01-02 12:00:00")))
        q2.processAllAvailable() // blocked by the restored marker
        ms.addData(Seq(at(6, 3L, "signup", "2024-04-15 10:00:00")))
        q2.processAllAvailable() // watermark passes u1's horizon
        assert(q2.lastProgress.stateOperators(0).numRowsTotal == 2L,
          "restored reclaim timer must fire: expected only u2 (active) + u3")
      } finally q2.stop()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
    import scala.jdk.CollectionConverters._
    val log = StreamingFunnelSpec.transitionLog.asScala.toSeq
    // batch ids continue across the restart (resumed, not replayed)
    val ids1 = log.filter(_._2.user_id == 1L).map(_._1)
    val ids3 = log.filter(_._2.user_id == 3L).map(_._1)
    assert(ids1.nonEmpty && ids3.nonEmpty && ids1.max < ids3.min,
      "restart did not resume from the checkpoint")
    // exactly one journey per user, nothing lost, nothing re-emitted
    def stages(u: Long) = log.filter(_._2.user_id == u).map(_._2.stage).sorted
    assert(stages(1L) == Seq(1, 2, 3), s"u1: ${stages(1L)}")
    assert(stages(2L) == Seq(1) && stages(3L) == Seq(1))
  }

  test("state bound MEASURED on the driver corpus: one row per distinct user, flat across batches") {
    import spark.implicits._
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .as[EventRow].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq
    val chunks = events.grouped(events.length / 3 + 1).toSeq
    val ms = MemoryStream[EventRow](spark)
    val q = FunnelStream.transitions(spark, ms.toDS())
      .writeStream.format("memory").queryName("funnel_state_bound")
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
      // replaying users already tracked mutates their rows in place;
      // the row COUNT — the 100 TB state budget — must stay flat
      ms.addData(chunks.head); q.processAllAvailable()
      assert(q.lastProgress.stateOperators(0).numRowsTotal == seen.size,
        "re-fed users must not grow the state store")
    } finally q.stop()
  }
}
