package graft

import graft.queries.PackingQueries
import graft.sources.Tables
import graft.streaming.PackingStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming maintenance of the packed training stream
  * ([[graft.streaming.PackingStream]]): documents fed in doc_id order
  * through a frozen tokenizer artifact must accumulate to EXACTLY the
  * one-shot batch frame (PackingQueries.bpePackedTokens) under any
  * batch split, and a redelivered micro-batch must be a no-op on both
  * stores (the batchId guard). The StreamingLmSpec pattern, for the
  * packer. */
object StreamingPackingSpec {
  case class Doc(doc_id: Long, text: String)
}

class StreamingPackingSpec extends AnyFunSuite {
  import StreamingPackingSpec.Doc

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def triples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))

  test("chunked ingest converges to the batch frame; replay is a no-op") {
    import spark.implicits._
    val prefix = "packspec_"
    PackingStream.drop(spark, prefix)
    PackingStream.init(spark, prefix, buckets = 4)
    try {
      // the frozen tokenizer artifact: corpus-trained merge table +
      // corpus-wide symbol vocab — exactly what the batch packer uses
      val (merges, vocab) = PackingQueries.bpeTokenizer(spark, sf)
      val want = triples(PackingQueries.bpePackedTokens(spark, sf))
      assert(want.nonEmpty)

      // feed the corpus in doc_id order, unevenly chunked on purpose
      // — chunk boundaries land mid-sequence, so the tail sequence is
      // APPENDED TO across batches, not just extended
      val corpus = Tables.documents(spark, sf)
        .select("doc_id", "text").orderBy("doc_id")
        .as[(Long, String)].collect().map(t => Doc(t._1, t._2))
      val ms = MemoryStream[Doc](spark)
      val q = PackingStream.writer(ms.toDF(), merges, vocab, prefix, buckets = 4)
        .queryName("pack_stream_q").start()
      try corpus.grouped(37).foreach { b =>
        ms.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()

      assert(triples(PackingStream.read(spark, prefix)).sameElements(want),
        "accumulated packed stream must equal the one-shot batch frame")
      // the persisted tail is the total symbol count (= max offset + 1)
      val nSyms = want.length.toLong // vocab covers the corpus: no drops
      assert(PackingStream.tail(spark, prefix) == nSyms)

      // redelivered batch (same batch id) must be a no-op on BOTH
      // stores: first direct call applies, the replay skips
      val maxDoc = corpus.map(_.doc_id).max
      val extra = Seq(Doc(maxDoc + 1, "fresh append after the corpus"))
        .toDF("doc_id", "text")
      PackingStream.upsertBatch(spark, extra, merges, vocab, prefix, 4, Some(99L))
      val after1 = triples(PackingStream.read(spark, prefix))
      val tail1 = PackingStream.tail(spark, prefix)
      assert(after1.length > want.length, "first delivery must append")
      assert(tail1 > nSyms)
      PackingStream.upsertBatch(spark, extra, merges, vocab, prefix, 4, Some(99L))
      assert(triples(PackingStream.read(spark, prefix)).sameElements(after1),
        "redelivered batch must not re-append tokens")
      assert(PackingStream.tail(spark, prefix) == tail1,
        "redelivered batch must not re-bump the tail")
    } finally PackingStream.drop(spark, prefix)
  }

  test("frozen-vocab miss maps to UNK at its consumed offset — no holes") {
    import spark.implicits._
    val prefix = "packunk_"
    PackingStream.drop(spark, prefix)
    PackingStream.init(spark, prefix, buckets = 4)
    try {
      val (merges, vocab) = PackingQueries.bpeTokenizer(spark, sf)
      // a word from the corpus (in-vocab by construction) around a
      // character the ASCII fixture corpus cannot contain
      val known = Tables.documents(spark, sf).select("text")
        .as[String].head().trim.split("\\s+").head
      val doc = Seq(Doc(1L, s"$known 日 $known")).toDF("doc_id", "text")
      PackingStream.upsertBatch(spark, doc, merges, vocab, prefix, 4, Some(0L))
      val rows = triples(PackingStream.read(spark, prefix))
      val n = PackingStream.tail(spark, prefix)
      assert(rows.length.toLong == n,
        "one row per consumed offset — the UNK mapping closes the hole")
      assert(rows.map(_._2).toSeq == (0L until n).toSeq,
        "positions must be contiguous")
      assert(rows.exists(_._3 == PackingQueries.UnkTokenId),
        "the unseen character must surface as the UNK id")
      assert(rows.exists(_._3 >= 0L), "known symbols keep their vocab ids")
    } finally PackingStream.drop(spark, prefix)
  }
}
