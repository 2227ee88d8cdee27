package graft.sources

import graft.config.{AggregateSpec, AggregateType}
import graft.operators.EventAggregates
import graft.streaming.EventPipeline.EventRow
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Materialized per-user aggregate snapshots, kept fresh incrementally
  * from the event stream — the persistent form of the reference's
  * in-memory accumulator dicts (models/aggregate.py:41-83), which a
  * restart loses.
  *
  * Each micro-batch aggregates ITS OWN events with the same compiled
  * plan as the batch path (`EventAggregates.perUser`) and merges the
  * per-user delta into a user_id-bucketed table ADDITIVELY:
  * `new = coalesce(existing, 0) + coalesce(delta, 0)` — exact for
  * COUNT and SUM because both are associative over disjoint event
  * sets. The merge is [[BucketedUpsert]]'s O(delta) bucket-pruned
  * generation-compose, so a micro-batch touching 10k users rewrites
  * ~10k users' buckets of a 100 TB snapshot table, never the table.
  *
  * DISTINCT_COUNT is not additive across batches (the same value can
  * recur) — it persists as a mergeable HLL SKETCH column instead
  * (`<name>_sketch`, raw register bytes): each micro-batch's delta
  * sketch unions into the stored one (elementwise max — associative,
  * idempotent), and reads estimate with `HllEstimate`. Exactly-once
  * for the additive columns: each event must be counted once — run
  * behind the bounded pipeline's dropDuplicatesWithinWatermark or an
  * idempotent source (sketch columns tolerate replay by idempotence).
  */
object AggStore {

  val DefaultTable = "graft_user_aggs"

  /** The additive subset of a config's aggregates. */
  def additive(specs: Seq[AggregateSpec]): Seq[AggregateSpec] =
    specs.filter(_.aggType != AggregateType.DistinctCount)

  private def distincts(specs: Seq[AggregateSpec]): Seq[AggregateSpec] =
    specs.filter(_.aggType == AggregateType.DistinctCount)

  /** One micro-batch's snapshot delta: additive aggregates + one HLL
    * sketch column per DISTINCT_COUNT spec, all in ONE groupBy. */
  def snapshot(events: DataFrame, specs: Seq[AggregateSpec]): DataFrame = {
    val deduped = events.dropDuplicates("event_id")
    val exprs = additive(specs).map(EventAggregates.aggExpr) ++
      distincts(specs).map { sp =>
        graft.functions.expressions.HllSketchBuild(
          when(col("event_type") === lit(sp.eventType),
            EventAggregates.fieldCol(sp.field.get).cast("long")))
          .as(sp.name + "_sketch")
      }
    deduped.groupBy(col("user_id")).agg(exprs.head, exprs.tail: _*)
  }

  def drop(spark: SparkSession, table: String): Unit =
    BucketedUpsert.drop(spark, table)

  def read(spark: SparkSession, table: String = DefaultTable): DataFrame =
    BucketedUpsert.read(spark, table)

  /** Read with sketch columns rendered as distinct-count estimates
    * (the serve-path projection). */
  def readEstimates(spark: SparkSession, specs: Seq[AggregateSpec],
                    table: String = DefaultTable): DataFrame = {
    val base = read(spark, table)
    base.select(col("user_id") +:
      (additive(specs).map(sp => col(sp.name)) ++
        distincts(specs).map(sp =>
          graft.functions.expressions.HllEstimate(col(sp.name + "_sketch"))
            .as(sp.name))): _*)
  }

  /** Bootstrap the snapshot table from a (possibly empty) events
    * frame. */
  def materialize(events: DataFrame, specs: Seq[AggregateSpec],
                  table: String = DefaultTable, buckets: Int = 32): Unit =
    BucketedUpsert.materialize(snapshot(events, specs),
      table, "user_id", buckets)

  /** Merge one micro-batch's per-user delta: numeric columns add,
    * sketch columns union; either side absent falls back to the
    * other. `batchId` guards at-least-once redelivery — the additive
    * columns are NOT replay-idempotent, so a batch whose id is
    * already recorded on the served generation is skipped (the
    * streaming writer always passes it). */
  def upsert(spark: SparkSession, batchEvents: DataFrame,
             specs: Seq[AggregateSpec], table: String = DefaultTable,
             buckets: Int = 32, batchId: Option[Long] = None): Unit =
    BucketedUpsert.upsert(spark, table, snapshot(batchEvents, specs),
      Seq("user_id"), "user_id", buckets,
      merge = (name, ex, dl) =>
        if (name.endsWith("_sketch"))
          when(ex.isNull, dl).when(dl.isNull, ex)
            .otherwise(graft.functions.expressions.HllUnion(ex, dl))
        else coalesce(ex, lit(0)) + coalesce(dl, lit(0)),
      batchId = batchId)

  /** Streaming sink: events → per-batch aggregate deltas → additive
    * table upserts, idempotent under micro-batch redelivery via the
    * recorded (query id, batch id).
    *
    * Run the returned writer WITH a `checkpointLocation`: batch ids
    * only replay (and so only need deduplicating) when a checkpoint
    * makes them monotone across restarts. An uncheckpointed restart is
    * still safe — it gets a fresh query id, so its batch 0 is never
    * mistaken for a previously recorded batch 0 — but it re-counts
    * whatever events the source re-delivers, because without a
    * checkpoint nothing remembers the consumed offsets. */
  def writer(events: Dataset[EventRow], specs: Seq[AggregateSpec],
             table: String = DefaultTable,
             buckets: Int = 32): DataStreamWriter[EventRow] =
    events.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[EventRow], bid: Long) =>
        upsert(batch.sparkSession, batch.toDF(), specs, table, buckets,
          batchId = Some(bid))
      }
}
