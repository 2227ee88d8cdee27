package graft.streaming

import graft.functions.TextOps.tokens
import graft.functions.expressions.{CmsUnion, CountMinAgg}
import graft.sources.BucketedUpsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming token-frequency monitor on the Count-Min sketch: each
  * arriving micro-batch of documents reduces to ONE 8 KiB sketch (the
  * CountMinAgg partial — O(1) state regardless of batch vocabulary)
  * and merges into a single-row store by counter ADDITION
  * ([[graft.functions.expressions.CmsUnion]]). Addition is
  * associative and commutative, so the stored sketch is bit-identical
  * to a one-shot batch sketch of everything ingested, under ANY
  * chunking of the feed — the OverlapMonitorStream property, asserted
  * byte-for-byte in StreamingCmsSpec. Point lookups
  * (`cms_estimate(sketch, token)`) then answer "how often has THIS
  * token been seen so far" against live ingest without any per-token
  * state: where [[DriftMonitorStream]] keeps exact per-token counts
  * (O(vocabulary) store rows), this keeps 8 KiB total and trades
  * exactness for the CMS overestimate bound — the right tool when the
  * token space is unbounded (URLs, n-grams, user agents).
  *
  * Exactly-once: addition is not replay-idempotent, so the batch id
  * rides BucketedUpsert's replay guard (the AggStore contract).
  */
object CmsMonitorStream {

  val DefaultTable = "graft_cms_tokens"

  /** Single-row store: slot key + sketch bytes. */
  private val Slot = "tokens"

  /** Create an empty store (idempotent). */
  def init(spark: SparkSession, table: String = DefaultTable): Unit =
    if (!BucketedUpsert.adopt(spark, table)) {
      import spark.implicits._
      BucketedUpsert.materialize(
        Seq.empty[(String, Array[Byte])].toDF("slot", "sketch"),
        table, "slot", buckets = 1)
    }

  def drop(spark: SparkSession, table: String = DefaultTable): Unit =
    BucketedUpsert.drop(spark, table)

  /** Merge one micro-batch of documents (`text` column): one sketch
    * per batch, one single-row counter addition into the store. */
  def upsertBatch(spark: SparkSession, batch: DataFrame,
                  table: String = DefaultTable,
                  batchId: Option[Long] = None): Unit = {
    val delta = batch
      .select(explode(tokens(col("text"))).as("t"))
      .agg(CountMinAgg(col("t")).as("sketch"))
      .select(lit(Slot).as("slot"), col("sketch"))
    BucketedUpsert.upsert(spark, table, delta,
      Seq("slot"), "slot", buckets = 1,
      merge = (c, ex, dl) =>
        if (c == "sketch") coalesce(CmsUnion(ex, dl), dl, ex) else coalesce(dl, ex),
      batchId = batchId)
  }

  /** Streaming sink: `docs.writeStream` → incremental sketch merges. */
  def writer(docs: DataFrame, table: String = DefaultTable): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        upsertBatch(batch.sparkSession, batch, table, Some(id))
      }

  /** The live sketch bytes (None before the first merge). */
  def sketch(spark: SparkSession, table: String = DefaultTable): Option[Array[Byte]] =
    BucketedUpsert.read(spark, table)
      .select(col("sketch")).collect()
      .headOption.map(_.getAs[Array[Byte]](0))
}
