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

  test("continuous ProcessingTime ingest over a GROWING directory converges to batch") {
    import spark.implicits._
    // the reference's live seam is HTTP ingest while the service runs;
    // the file-source analogue is a drop directory that gains files
    // WHILE the query is running under a ProcessingTime trigger — not
    // an AvailableNow drain of a fixed listing
    val drop = java.nio.file.Files.createTempDirectory("graft_live_events").toFile
    val stage = java.nio.file.Files.createTempDirectory("graft_live_stage").toFile
    val fs = new org.apache.hadoop.fs.Path(drop.getAbsolutePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // slice the fixture into 4 deterministic files in EVENT-TIME order
    // (the realistic arrival pattern, and required: the bounded
    // pipeline's watermark would drop a whole slice arriving behind
    // the stream's max event time). Raw schema on purpose — ts stays
    // the nanos long, the source's typed branch must handle it.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val nSlices = 4
    val raw = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{ntile, col}
      spark.read.parquet(s"$sf/events.parquet")
        .withColumn("__slice",
          ntile(nSlices).over(Window.orderBy(col("ts"), col("event_id"))) - 1)
    }
    def writeSlice(i: Int): Unit = {
      val part = raw.filter(org.apache.spark.sql.functions.col("__slice") === i)
        .drop("__slice")
      val stagePath = s"${stage.getAbsolutePath}/s$i"
      part.coalesce(1).write.parquet(stagePath)
      val f = fs.globStatus(new org.apache.hadoop.fs.Path(s"$stagePath/part-*.parquet"))(0).getPath
      // rename = atomic appearance, the real file-arrival pattern
      fs.rename(f, new org.apache.hadoop.fs.Path(s"${drop.getAbsolutePath}/events-000$i.parquet"))
    }

    writeSlice(0) // schema lock + first micro-batch need one file up front
    val stream = FileEventSource.events(spark, drop.getAbsolutePath,
      glob = "events-*.parquet")
    val q = EventPipeline.grantChangesBounded(spark, stream, cfg)
      .writeStream.format("memory").queryName("file_flips_pt")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      q.processAllAvailable()
      val afterFirst = q.recentProgress.map(_.numInputRows).sum
      assert(afterFirst > 0, "first slice must flow before the rest exist")
      (1 until nSlices).foreach { i =>
        writeSlice(i) // the directory grows while the query is RUNNING
        q.processAllAvailable()
      }
      assert(q.isActive, "ProcessingTime keeps the query alive across growth")
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
        "growth must arrive as separate micro-batches, not one drain")

      val flips = spark.table("file_flips_pt").as[GrantChange].collect().toSeq
      val events = graft.sources.Tables.events(spark, sf)
      val batchGrants = Grants.long(EventAggregates.perUser(events, cfg.aggregates), cfg)
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getBoolean(2)).toMap
      val users = events.select("user_id").distinct().collect().map(_.getLong(0))
      val streamFinal = (for (u <- users; f <- cfg.features) yield {
        val last = flips.filter(c => c.user_id == u && c.feature == f.name).lastOption
        (u, f.name) -> last.map(_.has_grant).getOrElse(true)
      }).toMap
      assert(streamFinal == batchGrants,
        "grants after live growth must equal the batch compiler's")
    } finally {
      q.stop()
      fs.delete(new org.apache.hadoop.fs.Path(drop.getAbsolutePath), true)
      fs.delete(new org.apache.hadoop.fs.Path(stage.getAbsolutePath), true)
    }
  }
}
