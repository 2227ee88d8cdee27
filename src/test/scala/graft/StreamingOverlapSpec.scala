package graft

import graft.queries.TextQueries
import graft.sources.Tables
import graft.streaming.OverlapMonitorStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental overlap monitor vs the batch ground truth. KMV union is
  * associative with CANONICAL bytes, so the store must equal the
  * one-shot build BIT-FOR-BIT after any chunking of the feed — a
  * stronger parity than the drift monitor's value equality — and the
  * served overlap matrix must equal `source_overlap_kmv` row-for-row.
  */
object StreamingOverlapSpec {
  case class Doc(doc_id: Long, source: String, text: String)
}

class StreamingOverlapSpec extends AnyFunSuite {
  import StreamingOverlapSpec.Doc

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def sketchMap(table: String): Map[String, Array[Byte]] =
    OverlapMonitorStream.sketches(spark, table).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk")).toMap

  test("chunked stream accumulates BIT-IDENTICAL sketches; overlap matrix matches batch") {
    import spark.implicits._
    val table = "overlap_converge"
    OverlapMonitorStream.drop(spark, table)
    OverlapMonitorStream.init(spark, table, buckets = 4)
    try {
      val docs = Tables.documents(spark, sf)
        .select(col("doc_id"), col("source"), col("text")).as[Doc].collect()
      val ms = MemoryStream[Doc](spark)
      val q = OverlapMonitorStream.writer(ms.toDF(), table, buckets = 4)
        .queryName("overlap_converge_q").start()
      try docs.grouped(math.max(1, docs.length / 3)).foreach { c =>
        ms.addData(c.toSeq); q.processAllAvailable()
      } finally q.stop()

      val want = TextQueries.sourceSketches(Tables.documents(spark, sf))
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk")).toMap
      val got = sketchMap(table)
      assert(got.keySet == want.keySet)
      got.foreach { case (src, bytes) =>
        assert(java.util.Arrays.equals(bytes, want(src)),
          s"stream-accumulated sketch must be bit-identical to batch: $src")
      }

      // served matrix == the batch estimate frame, row for row (the
      // registered query folds this frame into its gated check)
      val live = OverlapMonitorStream.overlap(spark, table)
      val batch = TextQueries.sourceOverlap(
        TextQueries.sourceSketches(Tables.documents(spark, sf)))
      assert(live.exceptAll(batch).isEmpty && batch.exceptAll(live).isEmpty)
    } finally OverlapMonitorStream.drop(spark, table)
  }

  test("replay is a no-op by construction: union is idempotent") {
    import spark.implicits._
    val table = "overlap_replay"
    OverlapMonitorStream.drop(spark, table)
    OverlapMonitorStream.init(spark, table, buckets = 2)
    try {
      val b = Seq(Doc(1, "a", "x y z"), Doc(2, "b", "x q"))
      OverlapMonitorStream.upsertBatch(spark, b.toDF(), table, 2, 256, Some(7L))
      val before = sketchMap(table)
      // same batch id: replay guard skips the merge
      OverlapMonitorStream.upsertBatch(spark, b.toDF(), table, 2, 256, Some(7L))
      // NEW batch id with the SAME content: union idempotence makes it
      // a no-op too — the property the guard-free path relies on
      OverlapMonitorStream.upsertBatch(spark, b.toDF(), table, 2, 256, Some(8L))
      val after = sketchMap(table)
      assert(before.keySet == after.keySet)
      before.foreach { case (src, bytes) =>
        assert(java.util.Arrays.equals(bytes, after(src)), src)
      }
      // genuinely new content still lands
      OverlapMonitorStream.upsertBatch(spark,
        Seq(Doc(3, "a", "new words here")).toDF(), table, 2, 256, Some(9L))
      assert(!java.util.Arrays.equals(sketchMap(table)("a"), before("a")))
    } finally OverlapMonitorStream.drop(spark, table)
  }
}
