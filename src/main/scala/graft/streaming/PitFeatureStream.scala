package graft.streaming

import graft.streaming.EventPipeline.EventRow
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming point-in-time feature emission: the incremental twin of
  * the batch `pit_features` query — every arriving click emits a
  * training-example row carrying the user's running aggregates as
  * they stood STRICTLY BEFORE that click. In a stream this leakage
  * guarantee is free: the state update happens AFTER the emission, so
  * an example can only ever see the past — the same property the
  * batch query needs an exclusive-bound window for.
  *
  * State per user: four numbers (event/purchase/error counts + spend
  * in integer micros — additive, exact, no float drift across
  * batches) — one UnsafeRow key + 4-long value ≈ 88 bytes per user,
  * a MEASURED bound (StreamingPitSpec asserts numRowsTotal equals
  * distinct-users, flat across batches and replays): 1e9 users ≈
  * 88 GB across the cluster's state stores under NoTimeout
  * (lifetime features); GroupStateTimeout/TTL is the capacity dial
  * for deployments that age users out. Events fold in event-time
  * order within each batch (the
  * FunnelStream discipline); StreamingPitSpec pins convergence to the
  * oracled batch query on an in-order feed of the driver corpus.
  *
  * Why micros: a running DOUBLE spend would accumulate rounding that
  * depends on batch boundaries; integer micros make the streamed
  * features bit-equal to the batch DECIMAL sums after the same
  * rounding step.
  */
object PitFeatureStream {

  /** Running per-user aggregates (spend in exact integer micros). */
  final case class PitState(
      nEvents: Long, nPurchases: Long, nErrors: Long, spendMicros: Long)

  /** One training example: the click plus its leak-free features
    * (spend re-scaled to the batch query's round-4 double). */
  final case class PitExample(
      click_id: Long, user_id: Long, n_events_before: Long,
      n_purchases_before: Long, n_errors_before: Long, spend_before: Double)

  private def fold(userId: Long, events: Iterator[EventRow],
                   state: GroupState[PitState]): Iterator[PitExample] = {
    var st = state.getOption.getOrElse(PitState(0L, 0L, 0L, 0L))
    val out = scala.collection.mutable.ArrayBuffer[PitExample]()
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
    events.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
      if (e.event_type == "click") {
        // emit BEFORE updating — the point-in-time guarantee
        out += PitExample(e.event_id, userId, st.nEvents, st.nPurchases,
          st.nErrors,
          BigDecimal(st.spendMicros, 6).setScale(4, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
      }
      st = PitState(
        st.nEvents + 1,
        st.nPurchases + (if (e.event_type == "purchase") 1 else 0),
        st.nErrors + (if (e.event_type == "error") 1 else 0),
        st.spendMicros + (if (e.event_type == "purchase")
          BigDecimal(e.value).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .underlying.unscaledValue.longValueExact
        else 0L))
    }
    state.update(st)
    out.iterator
  }

  /** The streaming example generator: append-mode PIT examples. */
  def examples(spark: SparkSession,
               events: Dataset[EventRow]): Dataset[PitExample] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
  }
}
