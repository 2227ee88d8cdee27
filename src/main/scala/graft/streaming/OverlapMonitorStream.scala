package graft.streaming

import graft.functions.expressions.KmvUnion
import graft.queries.TextQueries
import graft.sources.BucketedUpsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming source-overlap monitor: the per-source KMV token sketches
  * behind `source_overlap_kmv`, maintained incrementally per ingest
  * window — "is this crawl starting to duplicate that one?" answered
  * live, without ever rescanning the corpus. Each arriving micro-batch
  * of documents collapses to ITS OWN per-source delta sketches (one
  * explode + one map-side-combined sketch aggregate, O(batch sources)
  * rows of O(k) bytes) and merges into a source-bucketed store via
  * `kmv_union`.
  *
  * KMV union is associative AND produces canonical bytes (the sketch
  * is a deterministic function of the hash SET), so the accumulated
  * store is BIT-IDENTICAL to a one-shot batch build over everything
  * ingested — asserted byte-for-byte in StreamingOverlapSpec, a
  * stronger parity than the drift monitor's value equality. Reads
  * share [[TextQueries.sourceOverlap]] verbatim with the batch query.
  *
  * Exactly-once: unlike the additive drift counts, kmv_union IS
  * idempotent (re-unioning the same hashes is a no-op), so replay
  * safety needs no batch-id guard; the guard is still wired through
  * for uniformity with the other stores.
  */
object OverlapMonitorStream {

  val DefaultTable = "graft_overlap_sketches"
  val DefaultBuckets = 8
  val DefaultK = 256

  /** Create an empty sketch store (idempotent). A store left on disk by an
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
        Seq.empty[(String, Array[Byte])].toDF("source", "sk"),
        table, "source", buckets)
    }

  def drop(spark: SparkSession, table: String = DefaultTable): Unit =
    BucketedUpsert.drop(spark, table)

  /** Merge one micro-batch of documents: per-source delta sketches,
    * O(delta) bucket rewrites. */
  def upsertBatch(spark: SparkSession, batch: DataFrame,
                  table: String = DefaultTable,
                  buckets: Int = DefaultBuckets,
                  k: Int = DefaultK,
                  batchId: Option[Long] = None): Unit =
    BucketedUpsert.upsert(spark, table, TextQueries.sourceSketches(batch, k),
      Seq("source"), "source", buckets,
      merge = (_, ex, dl) =>
        when(ex.isNull, dl).when(dl.isNull, ex).otherwise(KmvUnion(ex, dl)),
      batchId = batchId)

  /** Streaming sink: `docs.writeStream` → incremental sketch merges. */
  def writer(docs: DataFrame, table: String = DefaultTable,
             buckets: Int = DefaultBuckets,
             k: Int = DefaultK): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        upsertBatch(batch.sparkSession, batch, table, buckets, k, Some(id))
      }

  /** The accumulated `(source, sk)` sketch frame — bit-identical to a
    * one-shot [[TextQueries.sourceSketches]] over everything ingested. */
  def sketches(spark: SparkSession, table: String = DefaultTable): DataFrame =
    BucketedUpsert.read(spark, table)

  /** Live overlap matrix — `source_overlap_kmv`'s output over the
    * store, same read-path code. */
  def overlap(spark: SparkSession, table: String = DefaultTable): DataFrame =
    TextQueries.sourceOverlap(sketches(spark, table))
}
