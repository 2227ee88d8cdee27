package graft.streaming

import graft.queries.PackingQueries
import graft.sources.BucketedUpsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming corpus-drift monitor: the per-token train/eval counts
  * that feed `corpus_drift` (PackingQueries), maintained incrementally
  * per ingest window instead of recomputed over the whole corpus —
  * the AggStore pattern applied to the drift tripwire. Each arriving
  * micro-batch of documents reduces to ITS OWN `(token, c_train,
  * c_eval)` delta (one explode + one map-side-combined groupBy, O(
  * batch vocabulary) rows) and merges ADDITIVELY into a token-bucketed
  * store; counts are associative over disjoint document sets, so the
  * store equals the batch counts frame after any chunking of the feed
  * (asserted in StreamingDriftSpec).
  *
  * Reads share corpus_drift's scoring stage verbatim
  * ([[PackingQueries.driftScores]]) — the monitor can never diverge
  * from the oracle-checked batch query's math.
  *
  * Exactly-once: additive merges are NOT replay-idempotent, so every
  * micro-batch carries its foreachBatch batchId into the store's
  * replay guard (same contract as AggStore); feed it an append-only,
  * deduplicated document stream (run DocDedupStream upstream when the
  * source can repeat documents).
  */
object DriftMonitorStream {

  val DefaultTable = "graft_drift_counts"
  val DefaultBuckets = 32

  /** Create an empty counts store (idempotent). A store left on disk by an
    * earlier process is ADOPTED (catalog re-registration from its
    * publish marker, [[BucketedUpsert.adopt]]) instead of shadowed —
    * a restarted stream resumes its accumulated state, and the
    * restored replay-guard properties keep redelivered batches
    * no-ops across the restart. */
  def init(spark: SparkSession, table: String = DefaultTable,
           buckets: Int = DefaultBuckets): Unit =
    if (!BucketedUpsert.adopt(spark, table)) {
      import spark.implicits._
      BucketedUpsert.materialize(
        Seq.empty[(String, Long, Long)].toDF("token", "c_train", "c_eval"),
        table, "token", buckets)
    }

  def drop(spark: SparkSession, table: String = DefaultTable): Unit =
    BucketedUpsert.drop(spark, table)

  /** Merge one micro-batch of documents: additive per-token counts,
    * O(delta) bucket rewrites. */
  def upsertBatch(spark: SparkSession, batch: DataFrame,
                  table: String = DefaultTable,
                  buckets: Int = DefaultBuckets,
                  batchId: Option[Long] = None): Unit =
    BucketedUpsert.upsert(spark, table, PackingQueries.driftCounts(batch),
      Seq("token"), "token", buckets,
      merge = (_, ex, dl) => coalesce(ex, lit(0L)) + coalesce(dl, lit(0L)),
      batchId = batchId)

  /** Streaming sink: `docs.writeStream` → incremental count merges. */
  def writer(docs: DataFrame, table: String = DefaultTable,
             buckets: Int = DefaultBuckets): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        upsertBatch(batch.sparkSession, batch, table, buckets, Some(id))
      }

  /** The accumulated counts frame `(token, c_train, c_eval)` — equals
    * batch `driftCounts` over everything ingested. */
  def counts(spark: SparkSession, table: String = DefaultTable): DataFrame =
    BucketedUpsert.read(spark, table)

  /** Current drift scores — corpus_drift's output over the live
    * store, same scoring code path. */
  def drift(spark: SparkSession, table: String = DefaultTable): DataFrame =
    PackingQueries.driftScores(counts(spark, table))
}
