package graft

import graft.sources.Tables
import graft.streaming.DocDedupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental streaming dedup vs the batch ground truth, plus the
  * replay and arrival-order contracts that only exist on the
  * streaming path. */
object StreamingDocDedupSpec {
  case class Doc(doc_id: Long, text: String)
}

class StreamingDocDedupSpec extends AnyFunSuite {
  import StreamingDocDedupSpec.Doc

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("doc_id-ordered stream converges to batch dedup_exact canonicals") {
    import spark.implicits._
    val table = "ddp_converge"
    DocDedupStream.drop(spark, table)
    DocDedupStream.init(spark, table, buckets = 8)
    try {
      // two NULL-text docs ride in the LAST chunk: they must collapse
      // onto the documented 'null-text' sentinel (one store row,
      // first/min doc_id canonical), not accrete unmatchable NULL rows
      val nullDocs = Seq(Doc(9000001L, null), Doc(9000002L, null))
      val docs = Tables.documents(spark, sf)
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
        .as[Doc].collect() ++ nullDocs
      val ms = MemoryStream[Doc](spark)
      val q = DocDedupStream.writer(ms.toDF(), table, buckets = 8)
        .queryName("ddp_converge_q").start()
      try {
        docs.grouped(math.max(1, docs.length / 3)).foreach { chunk =>
          ms.addData(chunk.toSeq); q.processAllAvailable()
        }
      } finally q.stop()

      // streaming store == batch (fp → min doc_id) map, computed with
      // the SAME fingerprint expression the stream uses (sentinel
      // included) so the spec exercises the code's NULL contract
      // rather than silently diverging from it
      val got = DocDedupStream.read(spark, table).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = Tables.documents(spark, sf)
        .select(col("doc_id"), col("text"))
        .unionByName(nullDocs.toDF("doc_id", "text"))
        .groupBy(DocDedupStream.fingerprint.as("fp"))
        .agg(min(col("doc_id")).as("canonical_id")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want)
      assert(got("null-text") == 9000001L, "NULL texts must share the sentinel row")

      // classify agrees with the batch dedup_exact query row-for-row
      val streamed = DocDedupStream
        .classify(spark, Tables.documents(spark, sf), table, buckets = 8).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
      val batch = SparkEntry.queries("dedup_exact")(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
      assert(streamed.sameElements(batch))
    } finally DocDedupStream.drop(spark, table)
  }

  test("first seen stays canonical: later duplicates never steal the crown") {
    import spark.implicits._
    val table = "ddp_order"
    DocDedupStream.drop(spark, table)
    DocDedupStream.init(spark, table, buckets = 4)
    try {
      // doc 10 arrives BEFORE doc 3 with identical text: arrival order
      // beats doc_id order on the streaming path (by design — the
      // already-ingested copy must stay canonical)
      DocDedupStream.upsertBatch(spark,
        Seq(Doc(10L, "same text"), Doc(99L, "other")).toDF(), table, 4, Some(0L))
      DocDedupStream.upsertBatch(spark,
        Seq(Doc(3L, "same text")).toDF(), table, 4, Some(1L))
      val got = DocDedupStream.read(spark, table).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest("same text".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(got(fp) == 10L, "first arrival must stay canonical")
      val cls = DocDedupStream.classify(spark,
        Seq(Doc(3L, "same text"), Doc(7L, "never seen")).toDF(), table, buckets = 4)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      assert(cls(3L) == ((10L, true)), "later duplicate flags against the store")
      assert(cls(7L) == ((7L, false)), "unseen doc is its own canonical")
    } finally DocDedupStream.drop(spark, table)
  }

  test("redelivered batch is a no-op: replay guard + first-writer-wins") {
    import spark.implicits._
    val table = "ddp_replay"
    DocDedupStream.drop(spark, table)
    DocDedupStream.init(spark, table, buckets = 4)
    try {
      DocDedupStream.upsertBatch(spark,
        Seq(Doc(5L, "alpha")).toDF(), table, 4, Some(7L))
      val before = DocDedupStream.read(spark, table).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // exact redelivery (same batch id, mutated payload): the guard
      // must skip the merge outright
      DocDedupStream.upsertBatch(spark,
        Seq(Doc(1L, "alpha")).toDF(), table, 4, Some(7L))
      // non-guarded re-send of the duplicate text (new batch id):
      // first-writer-wins must still keep the original canonical
      DocDedupStream.upsertBatch(spark,
        Seq(Doc(1L, "alpha")).toDF(), table, 4, Some(8L))
      val after = DocDedupStream.read(spark, table).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(after == before, s"store drifted: $before -> $after")
    } finally DocDedupStream.drop(spark, table)
  }
}
