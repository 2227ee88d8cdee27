package graft

import graft.functions.TextOps.tokens
import graft.functions.expressions.{CmsOps, CountMinAgg}
import graft.sources.Tables
import graft.streaming.CmsMonitorStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming Count-Min monitor's contract: counter addition is
  * associative, so the store sketch after any chunking of the feed is
  * BYTE-identical to the one-shot batch sketch — and a redelivered
  * batch changes nothing. */
object StreamingCmsSpec {
  case class Doc(doc_id: Long, text: String)
}

class StreamingCmsSpec extends AnyFunSuite {
  import StreamingCmsSpec.Doc

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("chunked ingest sketch is byte-identical to the one-shot batch sketch") {
    import spark.implicits._
    val table = "cms_monitor_conv"
    CmsMonitorStream.drop(spark, table)
    CmsMonitorStream.init(spark, table)
    try {
      val docs = Tables.documents(spark, sf)
        .select(col("doc_id"), col("text")).as[Doc].collect()
      val ms = MemoryStream[Doc](spark)
      val q = CmsMonitorStream.writer(ms.toDF(), table)
        .queryName("cms_monitor_q").start()
      try {
        docs.grouped(math.max(1, docs.length / 4)).foreach { chunk =>
          ms.addData(chunk.toSeq); q.processAllAvailable()
        }
      } finally q.stop()

      val streamed = CmsMonitorStream.sketch(spark, table)
        .getOrElse(fail("no sketch in store"))
      val oneShot = Tables.documents(spark, sf)
        .select(explode(tokens(col("text"))).as("t"))
        .agg(CountMinAgg(col("t"))).collect().head.getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(streamed, oneShot),
        "chunked streaming sketch diverged from one-shot batch sketch")

      // live estimate >= exact for the corpus's most common token
      val (top, n) = Tables.documents(spark, sf)
        .select(explode(tokens(col("text"))).as("t"))
        .groupBy("t").count().orderBy(desc("count"), asc("t"))
        .collect().head match { case r => (r.getString(0), r.getLong(1)) }
      assert(CmsOps.estimate(streamed,
        org.apache.spark.unsafe.types.UTF8String.fromString(top)) >= n)

      // replay: same (caller, batch id) applies once, skips the second
      // time (addition is guarded, not idempotent)
      val extra = Seq(Doc(999001L, "replay replay replay")).toDF("doc_id", "text")
      CmsMonitorStream.upsertBatch(spark, extra, table, Some(100L))
      val once = CmsMonitorStream.sketch(spark, table).get
      assert(!java.util.Arrays.equals(once, streamed),
        "the extra batch should have merged")
      CmsMonitorStream.upsertBatch(spark, extra, table, Some(100L))
      val twice = CmsMonitorStream.sketch(spark, table).get
      assert(java.util.Arrays.equals(twice, once),
        "replayed batch mutated the sketch store")
    } finally CmsMonitorStream.drop(spark, table)
  }
}
