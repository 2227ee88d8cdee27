package graft

import graft.config.DefaultConfig
import graft.operators.{EventAggregates, Grants}
import graft.streaming.{EventPipeline, FileEventSource}
import graft.streaming.EventPipeline.GrantChange
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The ingest path nothing driver-fed can prove: a real file-stream
  * source (readStream over the event parquet) drained with
  * Trigger.AvailableNow through the bounded grant pipeline must end
  * at exactly the batch compiler's grants — schema-locked discovery,
  * micro-batch slicing and the drain trigger all on the line. */
class FileStreamIngestSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val cfg = DefaultConfig.config
  private val sf = "/root/testdata/sf0.001"

  test("file-stream ingest drains to the batch grants under AvailableNow") {
    import spark.implicits._
    val stream = FileEventSource.events(spark, sf)
    val q = EventPipeline.grantChangesBounded(spark, stream, cfg)
      .writeStream.format("memory").queryName("file_flips")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(!q.isActive, "AvailableNow must drain and stop on its own")

    val flips = spark.table("file_flips").as[GrantChange].collect().toSeq
    assert(flips.nonEmpty, "corpus must produce at least one flip")

    // final streaming state (default TRUE + last flip wins) == batch
    val events = graft.sources.Tables.events(spark, sf)
    val batchGrants = Grants.long(EventAggregates.perUser(events, cfg.aggregates), cfg)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getBoolean(2)).toMap
    val users = events.select("user_id").distinct().collect().map(_.getLong(0))
    val streamFinal = (for (u <- users; f <- cfg.features) yield {
      val last = flips.filter(c => c.user_id == u && c.feature == f.name).lastOption
      (u, f.name) -> last.map(_.has_grant).getOrElse(true)
    }).toMap
    assert(streamFinal == batchGrants)
  }
}
