package graft.streaming

import graft.config._
import graft.operators.RuleEval
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

  /** EventRow with props parsed to a typed map BEFORE the stateful
    * fold — `from_json` runs codegen'd upstream of groupByKey, so the
    * per-key state update reads typed fields instead of re-parsing
    * JSON per event (and malformed props strictly parse to null
    * rather than fuzzy-matching a regex). */
  final case class TypedEventRow(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: Map[String, String])

  /** The typed-props projection every pipeline variant applies before
    * its stateful operator. */
  private def typed(events: Dataset[EventRow]): Dataset[TypedEventRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types.{MapType, StringType}
    events.toDF()
      .withColumn("props", org.apache.spark.sql.functions.from_json(
        org.apache.spark.sql.functions.col("props"),
        MapType(StringType, StringType)))
      .as[TypedEventRow]
  }

  /** Emitted only when a grant flips (reference user_feature.py:32-44);
    * the notification payload of S3. */
  final case class GrantChange(user_id: Long, feature: String, has_grant: Boolean)

  final case class UserAggState(
      seenIds: Map[Long, Boolean],
      counts: Map[String, Long],
      sums: Map[String, Double],
      distincts: Map[String, Map[String, Boolean]],
      grants: Map[String, Boolean])

  private[graft] def emptyState: UserAggState =
    UserAggState(Map.empty, Map.empty, Map.empty, Map.empty, Map.empty)

  /** The shared per-user fold: apply the batch's events in event-time
    * order, re-evaluate grants after each, collect flips. Both state
    * APIs (flatMapGroupsWithState and transformWithState) wrap exactly
    * this, which is what makes their parity a code invariant rather
    * than a test hope.
    *
    * This is the ingest tier's hot loop — it runs once per EVENT on
    * every executor — so it works on mutable accumulators and the
    * pre-resolved [[RuleEval.Compiled]] plan, converting to the
    * immutable state shape once per (user, batch). The naive
    * immutable-maps-per-event version measured ~250 µs/event of fold
    * CPU at sf0.1 (a linear rule-name scan per rule reference, a
    * filtered Seq and a fresh grants Map per event); semantics are
    * bit-identical — null field ⇒ no update, divide-by-zero ⇒ abides,
    * missing aggregate ⇒ 0, default grant TRUE (StreamingParitySpec
    * pins batch/stream parity). */
  private[graft] def foldEvents(cfg: EngineConfig, userId: Long, st0: UserAggState,
                         events: Iterator[TypedEventRow],
                         trackSeen: Boolean = true): (UserAggState, Seq[GrantChange]) = {
    import scala.collection.mutable
    val cc = RuleEval.compiled(cfg)
    val counts = mutable.HashMap.empty[String, Long]; counts ++= st0.counts
    val sums = mutable.HashMap.empty[String, Double]; sums ++= st0.sums
    val distincts = mutable.HashMap.empty[String, mutable.HashSet[String]]
    st0.distincts.foreach { case (k, m) =>
      val s = mutable.HashSet.empty[String]; s ++= m.keysIterator; distincts(k) = s
    }
    val grants = mutable.HashMap.empty[String, Boolean]; grants ++= st0.grants
    var seen = st0.seenIds
    val changes = mutable.ArrayBuffer.empty[GrantChange]
    def aggValue(name: String): Double = {
      val c = counts.get(name)
      if (c.isDefined) c.get.toDouble
      else {
        val s = sums.get(name)
        if (s.isDefined) s.get
        else distincts.get(name) match {
          case Some(set) => set.size.toDouble
          case None => 0.0
        }
      }
    }
    val aggFn: String => Double = aggValue
    val arr = events.toArray
    java.util.Arrays.sort(arr, (a: TypedEventRow, b: TypedEventRow) => {
      val c = java.lang.Long.compare(a.ts.getTime, b.ts.getTime)
      if (c != 0) c else java.lang.Long.compare(a.event_id, b.event_id)
    })
    arr.foreach { e =>
      val dup = trackSeen && seen.contains(e.event_id) // uuid dedup (aggregate.py:54,57)
      if (!dup) {
        if (trackSeen) seen = seen.updated(e.event_id, true)
        cc.aggsByType.get(e.event_type).foreach { as =>
          var i = 0
          while (i < as.length) {
            val a = as(i)
            a.aggType match {
              case AggregateType.Count =>
                counts.update(a.name, counts.getOrElse(a.name, 0L) + 1L)
              case AggregateType.Sum => cc.fieldRefs(a.name) match {
                case RuleEval.ValueField =>
                  sums.update(a.name, sums.getOrElse(a.name, 0.0) + e.value)
                case RuleEval.PropsField(key) =>
                  if (e.props != null) e.props.get(key).foreach { v =>
                    sums.update(a.name, sums.getOrElse(a.name, 0.0) + v.toDouble)
                  }
                case RuleEval.NoField => ()
              }
              case AggregateType.DistinctCount => cc.fieldRefs(a.name) match {
                case RuleEval.ValueField =>
                  distincts.getOrElseUpdate(a.name,
                    scala.collection.mutable.HashSet.empty) += e.value.toString
                case RuleEval.PropsField(key) =>
                  if (e.props != null) e.props.get(key).foreach { v =>
                    distincts.getOrElseUpdate(a.name,
                      scala.collection.mutable.HashSet.empty) += v
                  }
                case RuleEval.NoField => ()
              }
            }
            i += 1
          }
        }
        // re-evaluate every feature (rules.py re-checks on each event);
        // default grant is TRUE (rules.py:112), flips are the CDC output
        var fi = 0
        while (fi < cc.featureNames.length) {
          val rules = cc.featureRules(fi)
          var granted = true
          var ri = 0
          while (granted && ri < rules.length) {
            granted = RuleEval.abides(rules(ri), aggFn)
            ri += 1
          }
          val name = cc.featureNames(fi)
          if (grants.getOrElse(name, true) != granted)
            changes += GrantChange(userId, name, granted)
          grants.update(name, granted)
          fi += 1
        }
      }
    }
    val st = UserAggState(seen, counts.toMap, sums.toMap,
      distincts.iterator.map { case (k, s) =>
        k -> s.iterator.map(_ -> true).toMap
      }.toMap,
      grants.toMap)
    (st, changes.toSeq)
  }

  /** Per-user state update (flatMapGroupsWithState shape). Default
    * grant is TRUE (rules.py:112), so the first emission happens when a
    * rule first revokes. */
  def updateUser(cfg: EngineConfig)(
      userId: Long, events: Iterator[TypedEventRow],
      state: GroupState[UserAggState]): Iterator[GrantChange] = {
    val (st, changes) = foldEvents(cfg, userId,
      state.getOption.getOrElse(emptyState), events)
    state.update(st)
    changes.iterator
  }

  /** Composite key for the distinct-value sets flattened into one
    * MapState: (aggregate name, observed value). */
  final case class DistinctKey(agg: String, v: String)

  /** The same per-user pipeline on Spark 4's transformWithState
    * StatefulProcessor API. The state is decomposed into typed
    * MapState handles (the v2 state store's composite state) rather
    * than one UserAggState blob: each seen-uuid / accumulator /
    * distinct-member / grant is its OWN RocksDB entry. The unbounded
    * seen-uuid set is touched ONLY by containsKey point lookups and
    * point inserts — never materialized — while the bounded state
    * (accumulators, distinct members, grants: O(config + per-user
    * cardinality)) is read per batch and written back diffed against
    * the batch-start snapshot, so unchanged entries cost nothing.
    * (A UserAggState blob also wouldn't encode: the tws state schema
    * rejects MapType fields.) TTLConfig.NONE keeps state forever like
    * the reference's dicts; a real deployment sets a TTL to bound the
    * seen-uuid state instead of growing it unboundedly. */
  final class GrantProcessor(cfg: EngineConfig)
      extends StatefulProcessor[Long, TypedEventRow, GrantChange] {
    @transient private var seen: org.apache.spark.sql.streaming.MapState[Long, Boolean] = _
    @transient private var counts: org.apache.spark.sql.streaming.MapState[String, Long] = _
    @transient private var sums: org.apache.spark.sql.streaming.MapState[String, Double] = _
    @transient private var distincts: org.apache.spark.sql.streaming.MapState[DistinctKey, Boolean] = _
    @transient private var grants: org.apache.spark.sql.streaming.MapState[String, Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val h = getHandle
      seen = h.getMapState("seenIds", Encoders.scalaLong, Encoders.scalaBoolean, TTLConfig.NONE)
      counts = h.getMapState("counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      sums = h.getMapState("sums", Encoders.STRING, Encoders.scalaDouble, TTLConfig.NONE)
      distincts = h.getMapState("distincts",
        Encoders.product[DistinctKey], Encoders.scalaBoolean, TTLConfig.NONE)
      grants = h.getMapState("grants", Encoders.STRING, Encoders.scalaBoolean, TTLConfig.NONE)
    }

    override def handleInputRows(userId: Long, events: Iterator[TypedEventRow],
                                 timers: TimerValues): Iterator[GrantChange] = {
      // uuid dedup by POINT LOOKUP — the seen-id set is the unbounded
      // one and is never materialized: prior-batch dupes are filtered
      // via containsKey, in-batch dupes via distinctBy (duplicate rows
      // are identical, so keeping any one is exact), and the fold runs
      // with trackSeen=false so it neither reads nor grows a seen map.
      val fresh = events.filterNot(e => seen.containsKey(e.event_id))
        .toSeq.distinctBy(_.event_id)
      // the remaining state is O(aggregates + distinct values), read
      // in full per batch (bounded by config and per-user cardinality,
      // not by event history)
      val st0 = UserAggState(
        seenIds = Map.empty,
        counts = counts.iterator().map { case (k, v) => k -> v }.toMap,
        sums = sums.iterator().map { case (k, v) => k -> v }.toMap,
        distincts = distincts.iterator().toSeq
          .groupBy(_._1.agg)
          .map { case (a, ks) => a -> ks.map(k => k._1.v -> k._2).toMap },
        grants = grants.iterator().map { case (k, v) => k -> v }.toMap)
      val (st, changes) = foldEvents(cfg, userId, st0, fresh.iterator,
        trackSeen = false)
      fresh.foreach(e => seen.updateValue(e.event_id, true))
      st.counts.foreach { case (k, v) =>
        if (!st0.counts.get(k).contains(v)) counts.updateValue(k, v) }
      st.sums.foreach { case (k, v) =>
        if (!st0.sums.get(k).contains(v)) sums.updateValue(k, v) }
      st.distincts.foreach { case (a, m) => m.foreach { case (dv, flag) =>
        if (!st0.distincts.get(a).exists(_.contains(dv)))
          distincts.updateValue(DistinctKey(a, dv), flag) } }
      st.grants.foreach { case (k, v) =>
        if (!st0.grants.get(k).contains(v)) grants.updateValue(k, v) }
      changes.iterator
    }
  }

  /** grantChanges on the transformWithState path; requires the RocksDB
    * state store provider when run as a streaming query. */
  def grantChangesTws(spark: SparkSession, events: Dataset[EventRow],
                      cfg: EngineConfig): Dataset[GrantChange] = {
    import spark.implicits._
    typed(events).groupByKey(_.user_id)
      .transformWithState(new GrantProcessor(cfg),
        TimeMode.None(), OutputMode.Append())
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
    typed(events).groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        updateUser(cfg))
  }

  /** Bounded per-user state for [[grantChangesBounded]]: the
    * accumulators plus a watermark-evicted `event_id → event-time ms`
    * dedup map. */
  final case class BoundedUserState(agg: UserAggState, seenTs: Map[Long, Long])

  /** Bounded-state variant: uuid dedup keeps only ids seen WITHIN the
    * watermark, evicted as it advances — the per-user state is then
    * O(aggregates + in-flight window), not O(events seen), closing the
    * one unbounded-state hole the default pipeline inherits from the
    * reference's dicts. The trade is the reference's exact forever-
    * dedup narrows to duplicates arriving within the watermark, the
    * standard production contract.
    *
    * The dedup lives INSIDE the per-user fold rather than as an
    * upstream `dropDuplicatesWithinWatermark`: a duplicate event
    * carries the same user_id as its original, so per-user scope loses
    * nothing — and the pipeline drops from two stateful operators
    * (dedup keyed by event_id, fold keyed by user_id: two shuffles of
    * the full event stream + 2× state-store commit fan-out per
    * micro-batch) to ONE. At 100 TB/day that is a full shuffle of the
    * ingest stream saved per batch; on the bench it halves the
    * per-batch fixed cost that dominates small-batch throughput.
    * Late rows (event time older than the watermark) are dropped
    * before the fold, exactly as the upstream dedup operator did.
    *
    * CHECKPOINT COMPATIBILITY: round 15 changed the state type from
    * `UserAggState` to [[BoundedUserState]] (and removed the upstream
    * dedup operator), so a checkpoint written by the pre-r15 pipeline
    * does NOT restore into this one — a long-lived deployment
    * upgrading across that boundary must restart from a fresh
    * checkpoint (and re-feed or accept the watermark-bounded gap),
    * not debug a state-deserialization failure.
    *
    * State-store provider: per-user state rides whatever
    * `spark.sql.streaming.stateStore.providerClass` the session
    * configures. The default in-memory HashMap provider holds every
    * user's state on-heap per partition — fine at bench scale,
    * memory-bound at 10⁹ users; set the conf to
    * `org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`
    * to move state off-heap with incremental checkpointing
    * (StreamBench: `SPARK_GRAFT_STREAM_PROVIDER=rocksdb`; measured
    * ev/s in BENCHNOTES "RocksDB state store"). */
  def grantChangesBounded(spark: SparkSession, events: Dataset[EventRow],
                          cfg: EngineConfig,
                          watermark: String = "15 minutes"): Dataset[GrantChange] = {
    import spark.implicits._
    typed(events)
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[TypedEventRow], state: GroupState[BoundedUserState]) => {
          val st0 = state.getOption.getOrElse(BoundedUserState(emptyState, Map.empty))
          val wm = state.getCurrentWatermarkMs()
          // late-data filter + prior-batch dedup (point lookups) +
          // in-batch dedup (duplicate rows are identical — keeping any
          // one is exact)
          val fresh = evs
            .filter(e => e.ts.getTime >= wm)
            .filterNot(e => st0.seenTs.contains(e.event_id))
            .toSeq.distinctBy(_.event_id)
          val (st, changes) = foldEvents(cfg, userId, st0.agg,
            fresh.iterator, trackSeen = false)
          // watermark eviction of the dedup map, then record this
          // batch's ids
          val seen = st0.seenTs.filter(_._2 >= wm) ++
            fresh.iterator.map(e => e.event_id -> e.ts.getTime)
          state.update(BoundedUserState(st, seen))
          changes.iterator
        })
  }
}
