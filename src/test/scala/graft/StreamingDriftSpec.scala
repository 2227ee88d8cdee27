package graft

import graft.sources.Tables
import graft.streaming.DriftMonitorStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental drift monitor vs the batch ground truth: the
  * accumulated counts store must equal corpus_drift's input frame
  * over everything ingested, and the served scores must equal the
  * batch query's output row-for-row. */
object StreamingDriftSpec {
  case class Doc(doc_id: Long, text: String)
}

class StreamingDriftSpec extends AnyFunSuite {
  import StreamingDriftSpec.Doc

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def countMap(table: String): Map[String, (Long, Long)] =
    DriftMonitorStream.counts(spark, table).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("chunked stream accumulates exactly the batch counts frame") {
    import spark.implicits._
    val table = "drift_converge"
    DriftMonitorStream.drop(spark, table)
    DriftMonitorStream.init(spark, table, buckets = 8)
    try {
      val docs = Tables.documents(spark, sf)
        .select(col("doc_id"), col("text")).as[Doc].collect()
      val ms = MemoryStream[Doc](spark)
      val q = DriftMonitorStream.writer(ms.toDF(), table, buckets = 8)
        .queryName("drift_converge_q").start()
      try docs.grouped(math.max(1, docs.length / 3)).foreach { c =>
        ms.addData(c.toSeq); q.processAllAvailable()
      } finally q.stop()

      val want = graft.queries.PackingQueries
        .driftCounts(Tables.documents(spark, sf)).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(countMap(table) == want)

      // served scores == the oracle-checked batch query, row for row
      // (same ORDER: score desc, token)
      val got = DriftMonitorStream.drift(spark, table).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val batch = SparkEntry.queries("corpus_drift")(spark, sf).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == batch)
    } finally DriftMonitorStream.drop(spark, table)
  }

  test("redelivered batch does not double-count (additive replay guard)") {
    import spark.implicits._
    val table = "drift_replay"
    DriftMonitorStream.drop(spark, table)
    DriftMonitorStream.init(spark, table, buckets = 4)
    try {
      DriftMonitorStream.upsertBatch(spark,
        Seq(Doc(1L, "alpha beta alpha"), Doc(10L, "alpha eval side")).toDF(),
        table, 4, Some(3L))
      val before = countMap(table)
      assert(before("alpha") == ((2L, 1L)), s"sanity: $before")
      // exact redelivery (same batch id): additive merge MUST be skipped
      DriftMonitorStream.upsertBatch(spark,
        Seq(Doc(1L, "alpha beta alpha"), Doc(10L, "alpha eval side")).toDF(),
        table, 4, Some(3L))
      assert(countMap(table) == before, "redelivered batch double-counted")
      // a genuinely new batch still adds
      DriftMonitorStream.upsertBatch(spark,
        Seq(Doc(2L, "beta")).toDF(), table, 4, Some(4L))
      assert(countMap(table)("beta")._1 == before("beta")._1 + 1)
    } finally DriftMonitorStream.drop(spark, table)
  }
}
