package graft.streaming

import graft.config._
import graft.operators.RuleEval
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's write path as Structured Streaming
  * (SURVEY.md §3.1): events → per-user incremental aggregates →
  * rule/feature evaluation → grant-flip CDC, keyed state per user.
  *
  * The reference runs 3 lock-guarded asyncio consumers over shared
  * dicts (app_builder.py:35, aggregate.py:91); here the same semantics
  * fall out of hash-partitioning by user_id — per-key serial updates,
  * cross-key parallel, no locks, arbitrarily many executors.
  *
  * State shape mirrors the reference accumulators
  * (models/aggregate.py:41-83): seen-uuid set for dedup, count/sum
  * scalars, distinct-value sets, plus the current grants
  * (user_feature.py:22). Seen-id state is unbounded exactly like the
  * reference's; production would bound it with
  * `withWatermark + dropDuplicates` upstream and drop `seenIds`.
  */
object EventPipeline {

  final case class EventRow(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  /** Emitted only when a grant flips (reference user_feature.py:32-44);
    * the notification payload of S3. */
  final case class GrantChange(user_id: Long, feature: String, has_grant: Boolean)

  final case class UserAggState(
      seenIds: Map[Long, Boolean],
      counts: Map[String, Long],
      sums: Map[String, Double],
      distincts: Map[String, Map[String, Boolean]],
      grants: Map[String, Boolean])

  private def emptyState: UserAggState =
    UserAggState(Map.empty, Map.empty, Map.empty, Map.empty, Map.empty)

  /** JSON props field extraction for the streaming path; mirrors
    * EventAggregates.fieldCol's `props.<key>` addressing. */
  private def fieldValue(e: EventRow, field: String): Option[String] =
    if (field.startsWith("props.")) {
      val key = field.stripPrefix("props.")
      // props is a flat JSON object {"k": 87}
      val m = s""""$key"\\s*:\\s*("([^"]*)"|[-0-9.eE+]+)""".r
      m.findFirstMatchIn(e.props).map { mm =>
        Option(mm.group(2)).getOrElse(mm.group(1))
      }
    } else if (field == "value") Some(e.value.toString)
    else None

  private def applyEvent(cfg: EngineConfig, st: UserAggState, e: EventRow): UserAggState = {
    if (st.seenIds.contains(e.event_id)) st // uuid dedup (aggregate.py:54,57)
    else {
      var counts = st.counts
      var sums = st.sums
      var distincts = st.distincts
      cfg.aggregates.filter(_.eventType == e.event_type).foreach { a =>
        a.aggType match {
          case AggregateType.Count =>
            counts = counts.updated(a.name, counts.getOrElse(a.name, 0L) + 1L)
          case AggregateType.Sum =>
            fieldValue(e, a.field.get).foreach { v =>
              sums = sums.updated(a.name, sums.getOrElse(a.name, 0.0) + v.toDouble)
            }
          case AggregateType.DistinctCount =>
            fieldValue(e, a.field.get).foreach { v =>
              val set = distincts.getOrElse(a.name, Map.empty)
              distincts = distincts.updated(a.name, set.updated(v, true))
            }
        }
      }
      UserAggState(st.seenIds.updated(e.event_id, true), counts, sums, distincts, st.grants)
    }
  }

  private def aggValue(st: UserAggState)(name: String): Double =
    st.counts.get(name).map(_.toDouble)
      .orElse(st.sums.get(name))
      .orElse(st.distincts.get(name).map(_.size.toDouble))
      .getOrElse(0.0)

  /** Per-user state update: fold the batch's events in event-time
    * order, re-evaluate grants, emit changes. Default grant is TRUE
    * (rules.py:112), so the first emission happens when a rule first
    * revokes. */
  def updateUser(cfg: EngineConfig)(
      userId: Long, events: Iterator[EventRow],
      state: GroupState[UserAggState]): Iterator[GrantChange] = {
    var st = state.getOption.getOrElse(emptyState)
    val changes = scala.collection.mutable.ArrayBuffer[GrantChange]()
    events.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      st = applyEvent(cfg, st, e)
      val newGrants = RuleEval.grants(cfg, aggValue(st))
      newGrants.foreach { case (f, g) =>
        if (st.grants.getOrElse(f, true) != g) changes += GrantChange(userId, f, g)
      }
      st = st.copy(grants = newGrants)
    }
    state.update(st)
    changes.iterator
  }

  /** Backlog/observability surface (SURVEY.md S5: the reference's
    * `GET /queue-size`, app.py:47-60). In Structured Streaming the
    * "queue" is the source backlog + state store, read from query
    * progress rather than an in-process counter. */
  def queueMetrics(q: org.apache.spark.sql.streaming.StreamingQuery): Map[String, Any] = {
    Option(q.lastProgress).map { p =>
      Map(
        "batch_id" -> p.batchId,
        "num_input_rows" -> p.numInputRows,
        "input_rows_per_sec" -> p.inputRowsPerSecond,
        "process_rows_per_sec" -> p.processedRowsPerSecond,
        "state_rows" -> p.stateOperators.map(_.numRowsTotal).sum)
    }.getOrElse(Map("batch_id" -> -1L))
  }

  /** Wire the pipeline over any Dataset[EventRow] — a streaming source
    * (MemoryStream, Kafka, file) or a static frame (batch mode runs the
    * same code path: the batch/stream parity guarantee). */
  def grantChanges(spark: SparkSession, events: Dataset[EventRow],
                   cfg: EngineConfig): Dataset[GrantChange] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        updateUser(cfg))
  }
}
