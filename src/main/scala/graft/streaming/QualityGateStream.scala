package graft.streaming

import graft.operators.{Expectation, Expectations}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming data-quality gate: the [[Expectations]] operator applied
  * at ingest time — every micro-batch is split into a clean output and
  * a quarantine (rows annotated with WHICH checks they failed), and
  * the per-batch audit counters ride the plan as `observe` metrics
  * (`StreamingQueryProgress.observedMetrics`, the EventIngest
  * pattern) so the health feed costs zero extra scans. The batch
  * `expectations_*` queries recompute the whole corpus per run; at
  * 100 TB ingest this is the viable shape — each row is judged once,
  * on arrival (reference analogue: the reject-on-ingest validation in
  * /root/reference/services/ingest.py, which drops bad events with
  * only a counter; here the rejects keep their data AND their
  * reasons, so quarantine triage is a query, not a re-ingest).
  *
  * Layout: each micro-batch writes `<dir>/batch_id=<id>/` for both
  * sides — Spark partition discovery exposes `batch_id` as a column
  * on read, and OVERWRITE of the batch's own directory makes a
  * foreachBatch redelivery (at-least-once delivery) rewrite the same
  * files instead of appending duplicates: replay-idempotent without a
  * store. The clean side keeps the input schema; the quarantine adds
  * the `violations` name array. A batch is annotated ONCE (persisted
  * micro-batch; micro-batches are small by construction) and split by
  * two zero-shuffle filters.
  *
  * Per-batch directories accumulate small files by design (each batch
  * is its own replay unit); run [[graft.sources.Layouts.compactLeaves]]
  * over the two roots as the periodic maintenance pass — batch dirs
  * are exactly the leaf shape it bin-packs.
  */
object QualityGateStream {

  /** Streaming sink: `docs.writeStream` → per-batch gate + metrics. */
  def writer(docs: DataFrame, checks: Seq[Expectation],
             cleanDir: String, quarantineDir: String,
             observeName: String = "expectations"): DataStreamWriter[Row] =
    Expectations.observed(docs, checks, observeName)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(batch, checks, cleanDir, quarantineDir, id)
      }

  /** One micro-batch's gate pass (also the redelivery unit — same id
    * ⇒ same target dirs ⇒ overwrite, not append). */
  private[graft] def writeBatch(batch: DataFrame, checks: Seq[Expectation],
                                cleanDir: String, quarantineDir: String,
                                id: Long): Unit = {
    val tagged = Expectations.annotate(batch, checks).persist()
    try {
      tagged.filter(Expectations.isClean).drop("violations")
        .write.mode(SaveMode.Overwrite).parquet(s"$cleanDir/batch_id=$id")
      tagged.filter(!Expectations.isClean)
        .write.mode(SaveMode.Overwrite).parquet(s"$quarantineDir/batch_id=$id")
    } finally tagged.unpersist()
  }

  /** All admitted rows across batches (`batch_id` is a partition
    * column from discovery). */
  def clean(spark: SparkSession, cleanDir: String): DataFrame =
    spark.read.parquet(cleanDir)

  /** All quarantined rows with their `violations` arrays. */
  def quarantined(spark: SparkSession, quarantineDir: String): DataFrame =
    spark.read.parquet(quarantineDir)
}
