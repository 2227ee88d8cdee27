package graft.streaming

import graft.streaming.EventPipeline.EventRow
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel-stage tracker: the real-time twin of the batch
  * `funnel_conversion` query (queries/AnalyticsQueries.scala) —
  * signup → click → purchase with min-timestamp chaining and the same
  * 24 h step window, emitting one row per user per stage REACHED (the
  * CDC shape: downstream consumers see transitions, not snapshots).
  *
  * State design for scale: per user exactly three optional epoch-µs
  * longs (the first qualifying timestamp of each stage) — O(1),
  * unlike a collect-the-events approach; and a COMPLETED funnel
  * (stage 3) removes its state entirely, so long-running streams hold
  * state only for in-flight funnels. Events are folded in event-time
  * order within each batch (the grantChanges discipline); cross-batch
  * late data follows the streaming contract everywhere else in this
  * engine — in-order delivery per user up to the micro-batch
  * boundary, convergence-to-batch asserted by StreamingFunnelSpec.
  *
  * The batch twin [[batchStages]] is THE parity target: identical
  * min-chaining join logic to the oracled query, exposed per-user so
  * the spec can compare the stream's final transitions row-for-row.
  */
object FunnelStream {

  /** 24 h in µs — MUST match AnalyticsQueries' StepWindowUs. */
  val StepWindowUs: Long = 86400000000L

  /** Per-user funnel state: first qualifying ts (µs) per stage;
    * 0 = unset (event-time µs of the fixtures are all > 0). */
  final case class FunnelState(sUs: Long, cUs: Long, pUs: Long)

  /** Emitted when a user REACHES a stage: (user, stage 1|2|3, at µs). */
  final case class FunnelTransition(user_id: Long, stage: Int, at_us: Long)

  private def fold(userId: Long, events: Iterator[EventRow],
                   state: GroupState[FunnelState]): Iterator[FunnelTransition] = {
    var st = state.getOption.getOrElse(FunnelState(0L, 0L, 0L))
    val out = scala.collection.mutable.ArrayBuffer[FunnelTransition]()
    // full µs: getTime carries integral millis, getNanos the sub-ms
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
    events.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
      val us = micros(e.ts)
      e.event_type match {
        case "signup" if st.sUs == 0L =>
          st = st.copy(sUs = us); out += FunnelTransition(userId, 1, us)
        case "click" if st.sUs != 0L && st.cUs == 0L &&
          us >= st.sUs && us < st.sUs + StepWindowUs =>
          st = st.copy(cUs = us); out += FunnelTransition(userId, 2, us)
        case "purchase" if st.cUs != 0L && st.pUs == 0L &&
          us >= st.cUs && us < st.cUs + StepWindowUs =>
          st = st.copy(pUs = us); out += FunnelTransition(userId, 3, us)
        case _ => ()
      }
    }
    if (st.pUs != 0L) state.remove() // completed funnel frees its state
    else state.update(st)
    out.iterator
  }

  /** The streaming funnel: append-mode transitions per user. */
  def transitions(spark: SparkSession,
                  events: Dataset[EventRow]): Dataset[FunnelTransition] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
  }

  /** Batch twin: per-user `(user_id, stage, s_us, c_us, p_us)` via the
    * same min-chaining joins as the oracled funnel_conversion query —
    * the parity target for [[transitions]]. */
  def batchStages(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val sg = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("us")).as("s_us"))
    val ck = e.filter(col("event_type") === "click")
      .join(sg, Seq("user_id"))
      .filter(col("us") >= col("s_us") && col("us") < col("s_us") + StepWindowUs)
      .groupBy(col("user_id")).agg(min(col("us")).as("c_us"))
    val pu = e.filter(col("event_type") === "purchase")
      .join(ck, Seq("user_id"))
      .filter(col("us") >= col("c_us") && col("us") < col("c_us") + StepWindowUs)
      .groupBy(col("user_id")).agg(min(col("us")).as("p_us"))
    sg.join(ck, Seq("user_id"), "left_outer")
      .join(pu, Seq("user_id"), "left_outer")
      .select(col("user_id"),
        when(col("p_us").isNotNull, 3).when(col("c_us").isNotNull, 2)
          .otherwise(1).as("stage"),
        col("s_us"), col("c_us"), col("p_us"))
  }
}
