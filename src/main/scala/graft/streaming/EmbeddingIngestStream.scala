package graft.streaming

import graft.sources.IvfIndexStore
import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** The composed VECTOR ingest path: semantic-decontamination gate +
  * incremental ANN-index maintenance in ONE pass over each arriving
  * embedding micro-batch. Chaining the standalone streams
  * ([[SemanticGateStream]] → a second stream tailing its clean
  * directory → [[IvfIndexStore.writer]]) reads every admitted vector
  * twice and adds a directory-listing hop; here each vector is
  * LSH-checked against the frozen eval set and — if clean — assigned
  * to its IVF cell and merged into the index the one time it is in
  * memory. The serving index therefore can never contain a
  * benchmark-adjacent vector, by construction rather than by audit
  * (the [[CurationStream]] economics, applied to embeddings).
  *
  * Replay-idempotent end to end (foreachBatch is at-least-once): the
  * quarantine overwrites its own `batch_id=<id>` directory and the
  * index merge carries the batch id into [[graft.sources
  * .BucketedUpsert]]'s replay guard, so a redelivered micro-batch is
  * a no-op on both sides.
  *
  * PQ code maintenance composes in: when the prefix carries trained
  * codebooks ([[IvfIndexStore.initPq]] before the stream starts —
  * the same freeze-before-ingest contract as the pivots), each clean
  * vector is ALSO encoded against them and its code rows merged in
  * the same micro-batch — the IVFADC serving index stays current
  * without a second pass or a second stream. No codebooks → cells
  * only (opt-in by init, never by flag drift).
  */
object EmbeddingIngestStream {

  /** Streaming sink over a `(vec_id, emb)` stream. The index at
    * `prefix` must exist ([[IvfIndexStore.init]] — pivots frozen
    * before ingest starts, the FAISS IVF contract). */
  def writer(vecs: DataFrame, eval: DataFrame, threshold: Double,
             contamDir: String, prefix: String,
             buckets: Int = IvfIndexStore.DefaultBuckets): DataStreamWriter[Row] = {
    // persisted for the stream's lifetime — the SemanticGateStream
    // frozen-eval contract: no per-micro-batch eval re-scan
    val probes = SemanticGateStream.evalProbes(eval).persist()
    vecs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, probes, threshold, contamDir, prefix, buckets, id)
      }
  }

  /** One micro-batch: tag ONCE, quarantine the hits, index the rest.
    * Also the redelivery unit. */
  private[graft] def processBatch(batch: DataFrame, probes: DataFrame,
                                  threshold: Double, contamDir: String,
                                  prefix: String, buckets: Int,
                                  id: Long): Unit = {
    val t = SemanticGateStream.tagged(batch, probes, threshold).persist()
    try {
      t.filter(col("n_eval_hits").isNotNull)
        .write.mode(SaveMode.Overwrite).parquet(s"$contamDir/batch_id=$id")
      val clean = t.filter(col("n_eval_hits").isNull)
        .select(col("vec_id"), col("emb"))
      val spark = batch.sparkSession
      IvfIndexStore.upsertBatch(spark, clean, prefix, buckets, Some(id))
      if (spark.catalog.tableExists(IvfIndexStore.codebooksTable(prefix)))
        IvfIndexStore.upsertPqBatch(spark, clean, prefix, buckets, Some(id))
    } finally t.unpersist()
  }
}
