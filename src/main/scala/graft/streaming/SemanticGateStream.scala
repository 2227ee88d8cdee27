package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming semantic-decontamination gate: the ingest-time form of
  * the batch `decontaminate_semantic` query. Every arriving embedding
  * micro-batch is checked against a FROZEN held-out eval set in
  * cosine space and split into an admitted output and a contaminated
  * quarantine (each hit annotated with how many eval docs it is near
  * and the max cosine) — benchmark-adjacent documents never enter the
  * training corpus instead of being scrubbed after the fact. The
  * batch query recomputes the whole corpus per run; at 100 TB ingest
  * this per-arrival judgment is the viable shape (the
  * QualityGateStream economics, applied to the embedding gate).
  *
  * Join shape per batch: the batch side computes its sign-LSH bucket
  * once; the EVAL side — small by construction, benchmark suites are
  * thousands of docs however big the corpus — carries the multi-probe
  * expansion (bits+1 buckets per eval vec, recovering neighbors one
  * sign-plane away). The equi-join is keyed on bucket, so per-batch
  * work is O(|batch| + collisions), never |batch|×|eval|. The probe
  * frame is PERSISTED by [[writer]] for the stream's lifetime: the
  * first micro-batch materializes it and every later batch joins the
  * cached rows — without the pin each batch would silently re-scan
  * the eval source, O(batches × eval) at scale (asserted in
  * StreamingSemanticGateSpec: the eval source can vanish after batch
  * one and the gate keeps serving the frozen probe set).
  *
  * Layout = [[QualityGateStream]]'s replay contract: each micro-batch
  * OVERWRITES its own `batch_id=<id>` partition directory on both
  * sides, so at-least-once redelivery rewrites the same files instead
  * of appending duplicates.
  */
object SemanticGateStream {

  private def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.expressions.CosineSimilarity(a, b)

  /** Multi-probe bucket expansion of the eval set `(eval_id, eemb)` —
    * the frame every micro-batch joins against. */
  def evalProbes(eval: DataFrame): DataFrame =
    eval.select(col("eval_id"), col("eemb"),
      explode(graft.queries.EmbeddingQueries.probeBuckets(
        graft.queries.EmbeddingQueries.bucketCol(col("eemb")))).as("bucket"))

  /** Streaming sink over a `(vec_id, emb)` embedding stream. The eval
    * probe frame is persisted here (frozen-eval contract): it stays
    * pinned for the stream's lifetime — the price of one small cached
    * frame buys never re-reading the eval source per micro-batch. */
  def writer(vecs: DataFrame, eval: DataFrame, threshold: Double,
             cleanDir: String, contamDir: String): DataStreamWriter[Row] = {
    val probes = evalProbes(eval).persist()
    vecs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(batch, probes, threshold, cleanDir, contamDir, id)
      }
  }

  /** Tag one micro-batch against the eval probe frame: the batch's
    * columns plus `n_eval_hits`/`max_sim` (null = clean). Probe
    * buckets are distinct and a batch vec has ONE bucket, so each
    * (vec, eval) pair joins at most once (same argument as the batch
    * query); the rollup keeps the verdict one-row-per-vec. Shared by
    * this sink and the composed [[EmbeddingIngestStream]]. */
  private[graft] def tagged(batch: DataFrame, probes: DataFrame,
                            threshold: Double): DataFrame = {
    val b = batch.withColumn("bucket",
      graft.queries.EmbeddingQueries.bucketCol(col("emb")))
    val hits = b.join(probes, Seq("bucket"))
      .withColumn("sim", cosine(col("emb"), col("eemb")))
      .filter(col("sim") >= threshold)
      .groupBy(col("vec_id"))
      .agg(countDistinct(col("eval_id")).as("n_eval_hits"),
        max(round(col("sim"), 5)).as("max_sim"))
    b.drop("bucket").join(hits, Seq("vec_id"), "left_outer")
  }

  /** One micro-batch's gate pass (also the redelivery unit). */
  private[graft] def writeBatch(batch: DataFrame, probes: DataFrame,
                                threshold: Double, cleanDir: String,
                                contamDir: String, id: Long): Unit = {
    val t = tagged(batch, probes, threshold).persist()
    try {
      t.filter(col("n_eval_hits").isNull)
        .drop("n_eval_hits", "max_sim")
        .write.mode(SaveMode.Overwrite).parquet(s"$cleanDir/batch_id=$id")
      t.filter(col("n_eval_hits").isNotNull)
        .write.mode(SaveMode.Overwrite).parquet(s"$contamDir/batch_id=$id")
    } finally t.unpersist()
  }

  /** All admitted embeddings across batches. */
  def clean(spark: SparkSession, cleanDir: String): DataFrame =
    spark.read.parquet(cleanDir)

  /** All quarantined embeddings with hit counts and max cosine. */
  def contaminated(spark: SparkSession, contamDir: String): DataFrame =
    spark.read.parquet(contamDir)
}
