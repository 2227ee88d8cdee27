package graft.streaming

import graft.streaming.EventPipeline.EventRow
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Non-driver-fed streaming ingest: the event parquet read as a FILE
  * STREAM (`spark.readStream`), proving the pipeline's ingest path
  * without a broker dependency — the reference ingests over live HTTP
  * (app.py:17-44); Structured Streaming's equivalent seam is "any
  * source that yields micro-batches", and a file source with
  * `Trigger.AvailableNow` is the smallest real one (same
  * DataStreamReader surface as Kafka: swap `.parquet(path)` for
  * `.format("kafka")` and nothing downstream changes).
  *
  * Every streaming spec elsewhere feeds MemoryStream by contract
  * (driver-fed); this source is the one that exercises schema-locked
  * file discovery, `maxFilesPerTrigger` batching and AvailableNow
  * drain semantics end to end (FileStreamIngestSpec asserts parity
  * with the batch compiler over the same corpus).
  *
  * The nanos handling mirrors [[graft.sources.Tables.events]]: the
  * driver fixture's `ts` is parquet TIMESTAMP(NANOS), which Spark 4
  * only reads as a long (nanosAsLong) — floor-divide to micros with
  * integer `div` (epoch-nanos exceed double's 53-bit mantissa).
  */
object FileEventSource {

  /** Streaming Dataset[EventRow] over the event parquet file(s) in
    * `dir` matching `glob` (default: the fixture's single
    * `events.parquet`). `maxFilesPerTrigger` splits a multi-file feed
    * into multiple micro-batches. A LIVE feed (files appearing while
    * the query runs under `Trigger.ProcessingTime`) uses a wider glob
    * (e.g. `events-*.parquet`) over a drop directory; at least one
    * file must exist at build time — the schema is locked from it. */
  def events(spark: SparkSession, dir: String,
             maxFilesPerTrigger: Int = 1,
             glob: String = "events.parquet"): Dataset[EventRow] = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file streams require an explicit schema; lock it to the batch
    // reader's inference so stream and batch can never disagree
    val schema = spark.read.option("pathGlobFilter", glob).parquet(dir).schema
    // a file stream monitors a DIRECTORY; the fixture dir holds every
    // table, so a glob pins discovery to the events file(s) only
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("pathGlobFilter", glob)
      .parquet(dir)
    // same ts normalization as the batch reader (nanos-long or NTZ →
    // TimestampType), so stream and batch rows are byte-identical
    graft.sources.Tables.normalizeTs(raw).as[EventRow]
  }
}
