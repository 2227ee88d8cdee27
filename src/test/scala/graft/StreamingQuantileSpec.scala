package graft

import graft.sources.{QuantileStore, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-maintained quantile sketches vs the batch ground truth.
  * The merge is bucket-wise count addition — exactly associative — so
  * the store's bytes must be BIT-EQUAL to a one-shot batch build over
  * the same rows, not merely estimate-close; and the served quantiles
  * must sit within the sketch's relative-error bound of the exact
  * sort-based percentile. */
object StreamingQuantileSpec {
  case class Ev(event_type: String, value: Double)
}

class StreamingQuantileSpec extends AnyFunSuite {
  import StreamingQuantileSpec.Ev

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def sketchMap(table: String): Map[String, Seq[Byte]] =
    QuantileStore.read(spark, table).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap

  test("chunked stream accumulates bit-identical sketches to batch") {
    import spark.implicits._
    val table = "quantiles_converge"
    QuantileStore.drop(spark, table)
    try {
      val events = Tables.events(spark, sf)
        .select(col("event_type"), col("value")).as[Ev]
      QuantileStore.init(spark, events.toDF(), "event_type", "value",
        table, buckets = 8)
      val rows = events.collect()
      val ms = MemoryStream[Ev](spark)
      val q = QuantileStore.writer(ms.toDF(), "event_type", "value",
        table, buckets = 8).queryName("quantiles_converge_q").start()
      try rows.grouped(math.max(1, rows.length / 4)).foreach { c =>
        ms.addData(c.toSeq); q.processAllAvailable()
      } finally q.stop()

      val want = QuantileStore.snapshot(events.toDF(), "event_type", "value")
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
      assert(sketchMap(table) == want,
        "streaming-maintained sketch bytes differ from the batch build")

      // served estimates within the sketch's relative-error bound of
      // the exact percentile at the same rank convention
      val exact = events.toDF()
        .groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("e50"),
          expr("percentile(value, 0.95)").as("e95"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      val served = QuantileStore.quantiles(spark, Seq(0.5, 0.95), table)
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      served.foreach { case (k, (p50, p95)) =>
        val (e50, e95) = exact(k)
        // 1% sketch error + interpolation-vs-rank slack: ~200-row
        // groups put neighbor gaps at a few percent of the value
        assert(math.abs(p50 - e50) <= math.max(math.abs(e50) * 0.06, 2.0),
          s"$k p50=$p50 exact=$e50")
        assert(math.abs(p95 - e95) <= math.max(math.abs(e95) * 0.06, 2.0),
          s"$k p95=$p95 exact=$e95")
      }
    } finally QuantileStore.drop(spark, table)
  }

  test("redelivered batch is a no-op (replay guard on additive union)") {
    import spark.implicits._
    val table = "quantiles_replay"
    QuantileStore.drop(spark, table)
    try {
      val b = Seq(Ev("click", 1.0), Ev("click", 2.0), Ev("view", 5.0)).toDF()
      QuantileStore.init(spark, b, "event_type", "value", table, buckets = 4)
      QuantileStore.upsertBatch(spark, b, "event_type", "value", table, 4,
        batchId = Some(7L))
      val before = sketchMap(table)
      // exact redelivery (same batch id) must not re-add counts
      QuantileStore.upsertBatch(spark, b, "event_type", "value", table, 4,
        batchId = Some(7L))
      assert(sketchMap(table) == before, "redelivered batch re-counted")
      // a genuinely new batch still merges
      QuantileStore.upsertBatch(spark,
        Seq(Ev("click", 3.0)).toDF(), "event_type", "value", table, 4,
        batchId = Some(8L))
      assert(sketchMap(table) != before)
    } finally QuantileStore.drop(spark, table)
  }
}
