package graft

import graft.operators.{Expectation, Expectations}
import graft.streaming.{CurationStream, DocDedupStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end composed ingest: quality gate + exact dedup + quarantine
  * in one foreachBatch ([[graft.streaming.CurationStream]]). Asserts
  * the three contracts that only exist on the composed path: (1) the
  * store converges to the batch reference computed by folding the SAME
  * arrival order over CLEAN rows only — dirty rows must never reach
  * the dedup store, even when they duplicate a clean row's text; (2)
  * the quarantine holds exactly the dirty rows with their violation
  * names; (3) a redelivered micro-batch is a no-op on BOTH sides. */
object StreamingCurationSpec {
  case class Doc(doc_id: Long, text: String)
}

class StreamingCurationSpec extends AnyFunSuite {
  import StreamingCurationSpec.Doc

  private lazy val spark = SparkTestSession.spark

  private val checks = Seq(
    Expectation("text_present", col("text").isNotNull),
    Expectation("text_long_enough", length(col("text")) >= 10))

  test("gate + dedup + quarantine compose; dirty rows never reach the store") {
    import spark.implicits._
    val table = "curation_compose"
    val qdir = java.nio.file.Files.createTempDirectory("graft_quar").toString
    DocDedupStream.drop(spark, table)
    DocDedupStream.init(spark, table, buckets = 4)
    try {
      // batch 0: two clean docs (one text repeated), one too-short, one null
      // batch 1: a dirty duplicate of a CLEAN text (must stay out of the
      //          store), a clean duplicate with higher id (must not steal
      //          the crown), and a brand-new clean doc
      val batches = Seq(
        Seq(Doc(1L, "the quick brown fox"), Doc(2L, "the quick brown fox"),
          Doc(3L, "short"), Doc(4L, null)),
        Seq(Doc(5L, "the quick brown fox"), Doc(6L, "a second clean document"),
          Doc(7L, "tiny")))
      val ms = MemoryStream[Doc](spark)
      val q = CurationStream.writer(ms.toDF(), checks, qdir, table, buckets = 4)
        .queryName("curation_compose_q").start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      } finally q.stop()

      // (1) store == fold of clean rows in arrival order (first writer
      // wins per fingerprint; doc 3/4/7 filtered, doc 2/5 lose to 1)
      val got = DocDedupStream.read(spark, table).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = Seq(Doc(1L, "the quick brown fox"),
        Doc(6L, "a second clean document"))
        .toDF("doc_id", "text")
        .select(DocDedupStream.fingerprint.as("fp"), col("doc_id")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"store $got != clean-fold reference $want")

      // (2) quarantine: exactly the dirty rows, violations named
      val quar = spark.read.parquet(qdir)
        .select(col("doc_id"), col("violations")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
      assert(quar == Map(
        3L -> Set("text_long_enough"),
        4L -> Set("text_present", "text_long_enough"),
        7L -> Set("text_long_enough")), s"quarantine was $quar")

      // (3) redelivery of batch 1 is a no-op on both sides
      CurationStream.processBatch(batches(1).toDF(), checks, qdir,
        table, 4, id = 1L)
      val afterStore = DocDedupStream.read(spark, table).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(afterStore == got, "replayed batch changed the dedup store")
      val afterQuar = spark.read.parquet(qdir).count()
      assert(afterQuar == 3L, s"replayed batch changed the quarantine ($afterQuar rows)")
    } finally DocDedupStream.drop(spark, table)
  }
}
