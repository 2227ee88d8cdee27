package graft

import graft.operators.{Expectation, Expectations}
import graft.sources.{CorpusWriter, Tables}
import graft.streaming.{DocDedupStream, QualityGateStream}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The curation stages composed end-to-end — the wiring a real
  * training-data pipeline runs, not just each operator alone:
  *
  *  1. streaming: quality gate → exact-dedup store (only admitted
  *     rows are ingested; the quarantine never reaches the store);
  *  2. batch: corpus_assemble → CorpusWriter export → re-export after
  *     corpus growth → manifest diff as the release gate.
  */
class CurationPipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def tmp(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p.resolve("out").toString
  }

  test("streaming gate feeds the dedup store: quarantined rows never ingest") {
    val checks = Seq(
      Expectation("min_tokens_12", size(split(trim(col("text")), " ")) >= 12),
      Expectation("max_chars_500", col("n_chars") <= 500))
    val (cleanDir, quarDir) = (tmp("cp_clean"), tmp("cp_quar"))
    val table = "cp_dedup"
    DocDedupStream.drop(spark, table)
    try {
      DocDedupStream.init(spark, table, buckets = 8)
      val docs = Tables.documents(spark, sf)
        .select(col("doc_id"), col("text"), col("n_chars"))
      // two micro-batches through gate THEN store — the composed
      // foreachBatch body of a gated ingest stream
      val half = docs.count() / 2
      Seq(docs.filter(col("doc_id") <= half) -> 0L,
        docs.filter(col("doc_id") > half) -> 1L).foreach { case (batch, id) =>
        QualityGateStream.writeBatch(batch, checks, cleanDir, quarDir, id)
        DocDedupStream.upsertBatch(spark,
          QualityGateStream.clean(spark, cleanDir)
            .filter(col("batch_id") === id),
          table, buckets = 8, batchId = Some(id))
      }
      // the store holds exactly the clean rows' fingerprints: every
      // quarantined doc is absent, every admitted doc classifies
      val store = DocDedupStream.read(spark, table)
      val (cleanBatch, quarBatch) = Expectations.split(docs, checks)
      val wantFps = cleanBatch
        .select(md5(col("text")).as("fp")).distinct().count()
      assert(store.count() == wantFps,
        "store must hold one row per distinct clean fingerprint")
      val quarFps = quarBatch.select(md5(col("text")).as("fp")).distinct()
      assert(store.join(quarFps, Seq("fp"), "left_semi").count() == 0,
        "no quarantined fingerprint may reach the store")
    } finally DocDedupStream.drop(spark, table)
  }

  test("assemble -> export -> grow -> re-export -> diff is the release gate") {
    val (v1, v2) = (tmp("cp_v1"), tmp("cp_v2"))
    val selected = SparkEntry.queries("corpus_assemble")(spark, sf)
      .join(Tables.documents(spark, sf).select("doc_id", "text"), Seq("doc_id"))
      .select("doc_id", "source", "score", "n_tok", "text")
    CorpusWriter.write(selected, v1, Seq("source"), "doc_id",
      rowsPerFile = 100, tokenCol = Some("n_tok"))

    // v2: one source gains a doc (changed), one vanishes (removed)
    val grown = selected
      .filter(col("source") =!= selected.select(min("source")).head().getString(0))
      .unionByName(selected.limit(1)
        .withColumn("doc_id", col("doc_id") + 1000000L))
    CorpusWriter.write(grown, v2, Seq("source"), "doc_id",
      rowsPerFile = 100, tokenCol = Some("n_tok"))

    val d = CorpusWriter.diff(spark, v1, v2).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(d.values.exists(_ == "removed"), d.toString)
    assert(d.values.exists(_ == "changed"), d.toString)
    assert(d.values.count(_ == "unchanged") > 0, d.toString)
    // the gate answers the release question: what moved, without
    // scanning either corpus
    val drift = CorpusWriter.diff(spark, v1, v2)
      .filter(col("status") === "changed")
      .select(sum(col("rows_new") - col("rows_old"))).head().getLong(0)
    assert(drift == 1L, s"one added doc must surface as +1 row, got $drift")
  }
}
