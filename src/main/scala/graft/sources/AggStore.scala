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
  * DISTINCT_COUNT is NOT additive across batches (the same value can
  * recur) and is excluded here — its scale path is a mergeable HLL
  * sketch column (functions.expressions.HllSketchAgg holds the
  * fixed-size state; persisting the sketch bytes per user is the
  * production extension). Exactly-once: additive merges require each
  * event counted once — run behind the bounded pipeline's
  * dropDuplicatesWithinWatermark (EventPipeline.grantChangesBounded's
  * dedup stage) or an idempotent source.
  */
object AggStore {

  val DefaultTable = "graft_user_aggs"

  /** The additive subset of a config's aggregates. */
  def additive(specs: Seq[AggregateSpec]): Seq[AggregateSpec] =
    specs.filter(_.aggType != AggregateType.DistinctCount)

  def drop(spark: SparkSession, table: String): Unit =
    BucketedUpsert.drop(spark, table)

  def read(spark: SparkSession, table: String = DefaultTable): DataFrame =
    BucketedUpsert.read(spark, table)

  /** Bootstrap the snapshot table from a (possibly empty) events
    * frame. */
  def materialize(events: DataFrame, specs: Seq[AggregateSpec],
                  table: String = DefaultTable, buckets: Int = 32): Unit =
    BucketedUpsert.materialize(
      EventAggregates.perUser(events, additive(specs)),
      table, "user_id", buckets)

  /** Merge one micro-batch's per-user aggregate delta additively. */
  def upsert(spark: SparkSession, batchEvents: DataFrame,
             specs: Seq[AggregateSpec], table: String = DefaultTable,
             buckets: Int = 32): Unit =
    BucketedUpsert.upsert(spark, table,
      EventAggregates.perUser(batchEvents, additive(specs)),
      Seq("user_id"), "user_id", buckets,
      merge = (_, ex, dl) =>
        coalesce(ex, lit(0)) + coalesce(dl, lit(0)))

  /** Streaming sink: events → per-batch aggregate deltas → additive
    * table upserts. */
  def writer(events: Dataset[EventRow], specs: Seq[AggregateSpec],
             table: String = DefaultTable,
             buckets: Int = 32): DataStreamWriter[EventRow] =
    events.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[EventRow], _: Long) =>
        upsert(batch.sparkSession, batch.toDF(), specs, table, buckets)
      }
}
