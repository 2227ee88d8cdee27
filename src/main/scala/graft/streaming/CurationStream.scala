package graft.streaming

import graft.operators.{Expectation, Expectations}
import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.streaming.DataStreamWriter

/** The composed ingest path of a training-data pipeline: quality gate
  * + exact first-writer dedup + quarantine in ONE pass over each
  * arriving micro-batch. Chaining the standalone streams
  * ([[QualityGateStream]] → a second stream tailing its clean
  * directory → [[DocDedupStream]]) reads every accepted row twice and
  * adds a directory-listing latency hop per stage; at 100 TB/day
  * ingest the composed form is the viable shape — each row is judged,
  * fingerprinted and merged the one time it is in memory.
  *
  * Replay-idempotent end to end (foreachBatch is at-least-once): the
  * quarantine side OVERWRITES its own `batch_id=<id>` directory (the
  * [[QualityGateStream]] layout — redelivery rewrites the same files),
  * and the dedup side carries the batch id into
  * [[graft.sources.BucketedUpsert]]'s replay guard, so a redelivered
  * micro-batch is a no-op on BOTH sides. The per-batch audit counters
  * ride the plan as `observe` metrics — the health feed costs zero
  * extra scans.
  *
  * Reference analogue: the reject-on-ingest validation in
  * /root/reference/services/ingest.py (drop + counter); here rejects
  * keep their rows AND their reasons, accepted rows land deduplicated.
  */
object CurationStream {

  /** Streaming sink: `docs.writeStream` → per-batch gate + dedup
    * merge. `table` must exist ([[DocDedupStream.init]]). */
  def writer(docs: DataFrame, checks: Seq[Expectation],
             quarantineDir: String,
             table: String = DocDedupStream.DefaultTable,
             buckets: Int = DocDedupStream.DefaultBuckets,
             observeName: String = "curation"): DataStreamWriter[Row] =
    Expectations.observed(docs, checks, observeName)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, checks, quarantineDir, table, buckets, id)
      }

  /** One micro-batch: annotate ONCE, split by two zero-shuffle
    * filters, quarantine + merge. Also the redelivery unit. */
  private[graft] def processBatch(batch: DataFrame, checks: Seq[Expectation],
                                  quarantineDir: String, table: String,
                                  buckets: Int, id: Long): Unit = {
    val tagged = Expectations.annotate(batch, checks).persist()
    try {
      tagged.filter(!Expectations.isClean)
        .write.mode(SaveMode.Overwrite).parquet(s"$quarantineDir/batch_id=$id")
      DocDedupStream.upsertBatch(batch.sparkSession,
        tagged.filter(Expectations.isClean).drop("violations"),
        table, buckets, Some(id))
    } finally tagged.unpersist()
  }
}
