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

  test("one hot user retrying cannot open the breaker (distinct-user rate)") {
    import spark.implicits._
    // 20 clean users + ONE user producing 6 denials: event-count rate
    // would be 6/26 ≈ 23% (open), but the reference's rate is over user
    // SETS (user_feature.py:116-120): 1/21 ≈ 4.8% → closed.
    val events = (1 to 20).map(i => ev(i, i, "view", 3)) ++
      (21 to 26).map(i => ev(i, 999, "error", 3))
    val rows = Windowed.circuit(events.toDF()).collect()
      .filter(_.getTimestamp(0).toString.startsWith("2024-01-01 00:00"))
    assert(rows.length == 1)
    assert(rows.head.getLong(1) == 21 && rows.head.getLong(2) == 1)
    assert(!rows.head.getBoolean(4))
  }

  private def att(user: Long, feature: String, success: Boolean, minute: Int)
  : (java.sql.Timestamp, Long, String, Boolean) =
    (java.sql.Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"),
      user, feature, success)

  test("reference cadence: 15-second slide puts each attempt in 40 windows") {
    import spark.implicits._
    // one instant of traffic: 10 users, 2 denied → 20% rate. At the
    // reference's 15 s slide (user_feature.py:98-104) that instant is
    // visible in 600/15 = 40 sliding windows, every one of them open.
    val attempts = (1 to 10).map(u => att(u, "purchase", success = u > 2, 3))
      .toDF("ts", "user_id", "feature", "success")
    val rows = Windowed.featureCircuit(attempts, 0.05,
      Windowed.ReferenceWindowSize, Windowed.ReferenceSlide).collect()
    assert(rows.length == 40, s"expected 40 windows, got ${rows.length}")
    assert(rows.forall(_.getBoolean(5)), "all covering windows must be open")
    // window starts advance in 15-second steps
    val starts = rows.map(_.getTimestamp(1).getTime).sorted
    assert(starts.sliding(2).forall { case Array(a, b) => b - a == 15000L })
    // and the latest-window serve state reflects the same cadence
    val latest = Windowed.latestFeatureCircuit(attempts, 0.05,
      Windowed.ReferenceWindowSize, Windowed.ReferenceSlide).collect()
    assert(latest.length == 1 && latest.head.getBoolean(1))
  }

  test("a denied-user burst opens one feature's circuit, not another's") {
    import spark.implicits._
    // 20 users touch both features; users 1-5 are denied on purchase
    // only → purchase 25% > 5% opens, message 0% stays closed.
    val attempts = (1 to 20).flatMap { u =>
      Seq(att(u, "purchase", success = u > 5, 3),
        att(u, "message", success = true, 3))
    }.toDF("ts", "user_id", "feature", "success")
    val byFeature = Windowed.featureCircuit(attempts).collect()
      .filter(_.getTimestamp(1).toString.startsWith("2024-01-01 00:00"))
      .map(r => r.getString(0) -> r.getBoolean(5)).toMap
    assert(byFeature == Map("purchase" -> true, "message" -> false))
  }

  test("an all-NULL-user window keeps the circuit CLOSED (no NaN open)") {
    import spark.implicits._
    // n_users counts ignore NULL users (countDistinct semantics), so a
    // window of only NULL-user attempts has n_users = 0. The rate must
    // read 0, not 0/0 = NaN — NaN compares greater than any threshold
    // in Spark's ordering and would spuriously OPEN the breaker.
    val attempts = (1 to 5)
      .map(_ => (java.sql.Timestamp.valueOf("2024-01-01 00:03:00"),
        null.asInstanceOf[java.lang.Long], "purchase", false))
      .toDF("ts", "user_id", "feature", "success")
    val rows = Windowed.featureCircuit(attempts).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.getBoolean(5)), "NULL-only window must stay closed")
    assert(rows.forall(r => r.getDouble(4) == 0.0), "rate must be 0, not NaN")
    // same guard on the event-stream breaker
    val events = (1 to 5).map(_ =>
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:03:00"),
        null.asInstanceOf[java.lang.Long], "error", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "properties")
    val c = Windowed.circuit(events).collect()
    assert(c.nonEmpty && c.forall(r => !r.getBoolean(4)))
  }

  test("latestFeatureCircuit serves the most recent window per feature") {
    import spark.implicits._
    // purchase: denied burst in the early window, healthy in the later
    // one → the served state is the LATEST window (closed).
    val attempts = ((1 to 10).map(u => att(u, "purchase", success = false, 1)) ++
      (1 to 10).map(u => att(u, "purchase", success = true, 21)))
      .toDF("ts", "user_id", "feature", "success")
    val latest = Windowed.latestFeatureCircuit(attempts).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(latest == Map("purchase" -> false))
  }

  test("sliding windows count each event in two 10-minute windows") {
    import spark.implicits._
    val rows = Windowed.slidingStats(Seq(ev(1, 1, "view", 7)).toDF()).collect()
    // minute 7 lands in windows starting 00:00 and 00:05
    assert(rows.map(_.getTimestamp(0).toString).sorted.toSeq ==
      Seq("2024-01-01 00:00:00.0", "2024-01-01 00:05:00.0"))
  }

  test("high-replica pre-dedup plan equals the direct sliding-window formulation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // slidingStats at the reference cadence (40 replicas) collapses to
    // (15 s tumble, user) BEFORE the window expand; this pins its
    // results against the direct formulation — the one the ≤8-replica
    // path still runs — on a frame where users repeat within and
    // across tumbles, denials and NULL users included. Seconds offsets
    // exercise tumble boundaries (0,7,14 share a tumble; 15,30 don't).
    def at(min: Int, sec: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")
    val rows = Seq(
      (1L, at(0, 0), 1L, "view"), (2L, at(0, 7), 1L, "view"),
      (3L, at(0, 14), 1L, "error"), (4L, at(0, 15), 1L, "view"),
      (5L, at(0, 30), 2L, "error"), (6L, at(1, 2), 2L, "error"),
      (7L, at(1, 2), 3L, "view"), (8L, at(9, 59), 3L, "error"),
      (9L, at(12, 40), 4L, "view"))
    val withNull = rows.map { case (id, ts, u, t) =>
      (id, ts, java.lang.Long.valueOf(u), t, 1.0, "{}")
    } :+ (10L, at(0, 7), null.asInstanceOf[java.lang.Long], "error", 1.0, "{}")
    val events = withNull
      .toDF("event_id", "ts", "user_id", "event_type", "value", "properties")
    val got = Windowed.slidingStats(events,
      Windowed.ReferenceWindowSize, Windowed.ReferenceSlide)
    // the direct (pre-r17) formulation, inlined
    val want = events
      .groupBy(window(col("ts"), Windowed.ReferenceWindowSize,
        Windowed.ReferenceSlide), col("user_id"))
      .agg(max(when(col("event_type") === "error", lit(1)).otherwise(lit(0)))
        .as("denied"),
        count(lit(1)).as("n"),
        count(when(col("event_type") === "error", lit(1))).as("nd"))
      .groupBy(col("window"))
      .agg(count(col("user_id")).as("n_users"),
        coalesce(sum(when(col("user_id").isNotNull, col("denied"))), lit(0L))
          .as("n_denied_users"),
        sum(col("n")).as("n_events"),
        sum(col("nd")).as("n_denials"))
      .select(col("window.start").as("win_start"), col("n_users"),
        col("n_denied_users"), col("n_events"), col("n_denials"))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    assert(key(got) == key(want))
    // and the range-decomposition path was actually taken: the plan
    // carries the endpoint-delta frame (win_us running sum), which the
    // direct expand formulation never builds (r21; pre-r21 this pinned
    // the "AS tumble" pre-dedup marker)
    assert(got.queryExecution.analyzed.toString.contains("win_us"))
    assert(!want.queryExecution.analyzed.toString.contains("win_us"))

    // featureStats takes the same pre-dedup at high replica counts —
    // pin it against the direct formulation on a two-feature fixture
    // derived from the same rows (denied = the error events)
    val attempts = events.select(col("ts"), col("user_id"),
      when(col("event_id") % 2 === 0, "purchase").otherwise("message")
        .as("feature"),
      (col("event_type") =!= "error").as("success"))
    val gotF = Windowed.featureStats(attempts,
      Windowed.ReferenceWindowSize, Windowed.ReferenceSlide)
    val wantF = attempts
      .groupBy(col("feature"), window(col("ts"),
        Windowed.ReferenceWindowSize, Windowed.ReferenceSlide),
        col("user_id"))
      .agg(max(when(!col("success"), lit(1)).otherwise(lit(0))).as("denied"))
      .groupBy(col("feature"), col("window"))
      .agg(count(col("user_id")).as("n_users"),
        coalesce(sum(when(col("user_id").isNotNull, col("denied"))), lit(0L))
          .as("n_denied_users"))
      .select(col("feature"), col("window.start").as("win_start"),
        col("n_users"), col("n_denied_users"))
    def keyF(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getLong(3))).sorted.toSeq
    assert(keyF(gotF) == keyF(wantF))
    assert(gotF.queryExecution.analyzed.toString.contains("AS tumble"))
  }

  test("randomized events: pre-dedup sliding stats equal the direct plan") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Seeded random event frames — users repeating within and across
    // 15 s tumbles, ~1/8 NULL users, ~1/3 denials, timestamps spread
    // over 15 min so windows straddle every tumble alignment — pin the
    // high-replica pre-dedup against the direct formulation across
    // shapes the handcrafted fixture doesn't enumerate.
    val rnd = new scala.util.Random(171L)
    for (trial <- 1 to 8) {
      val rows = (1 to 30 + rnd.nextInt(40)).map { i =>
        val ts = java.sql.Timestamp.valueOf(
          f"2024-01-01 00:${rnd.nextInt(15)}%02d:${rnd.nextInt(60)}%02d")
        val u: java.lang.Long =
          if (rnd.nextInt(8) == 0) null
          else java.lang.Long.valueOf(1L + rnd.nextInt(5))
        val t = if (rnd.nextInt(3) == 0) "error" else "view"
        (i.toLong, ts, u, t, 1.0, "{}")
      }
      val events = rows
        .toDF("event_id", "ts", "user_id", "event_type", "value", "properties")
      val got = Windowed.slidingStats(events,
        Windowed.ReferenceWindowSize, Windowed.ReferenceSlide)
      val want = events
        .groupBy(window(col("ts"), Windowed.ReferenceWindowSize,
          Windowed.ReferenceSlide), col("user_id"))
        .agg(max(when(col("event_type") === "error", lit(1)).otherwise(lit(0)))
          .as("denied"),
          count(lit(1)).as("n"),
          count(when(col("event_type") === "error", lit(1))).as("nd"))
        .groupBy(col("window"))
        .agg(count(col("user_id")).as("n_users"),
          coalesce(sum(when(col("user_id").isNotNull, col("denied"))), lit(0L))
            .as("n_denied_users"),
          sum(col("n")).as("n_events"),
          sum(col("nd")).as("n_denials"))
        .select(col("window.start").as("win_start"), col("n_users"),
          col("n_denied_users"), col("n_events"), col("n_denials"))
      def key(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).sorted.toSeq
      assert(key(got) == key(want), s"trial $trial diverged")
    }
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
