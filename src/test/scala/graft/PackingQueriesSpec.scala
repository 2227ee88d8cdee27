package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the training-data assembly operators that
  * the oracle hash alone would not explain on failure: packing
  * conservation (every token lands in exactly one chunk slot), chunk
  * geometry (stride/window/tail rules), and redaction completeness
  * (no plantable pattern survives). */
class PackingQueriesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("pack_sequences: full chunks except the tail; tokens conserved") {
    val rows = SparkEntry.queries("pack_sequences")(spark, sf)
      .orderBy("chunk_id").collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getLong(0))
    assert(ids.head == 0 && ids.sameElements(ids.indices.map(_.toLong)),
      "chunk ids must be contiguous from 0 — packing leaves no gaps")
    rows.init.foreach { r =>
      assert(r.getAs[Long]("n_tokens_filled") == 512L,
        s"non-tail chunk ${r.getLong(0)} not full: $r")
    }
    assert(rows.last.getAs[Long]("n_tokens_filled") <= 512L)
    val totalFilled = rows.map(_.getAs[Long]("n_tokens_filled")).sum
    val totalTokens = graft.sources.Tables.documents(spark, sf)
      .select(sum(size(split(trim(col("text")), " ")).cast("long")))
      .head().getLong(0)
    assert(totalFilled == totalTokens,
      "every corpus token must land in exactly one chunk slot")
    val startsSum = rows.map(_.getAs[Long]("n_docs_starting")).sum
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(startsSum == nDocs, "every doc starts in exactly one chunk")
  }

  test("doc_chunks: stride geometry, full coverage, real chunk text") {
    val rows = SparkEntry.queries("doc_chunks")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("chunk_start"), r.getAs[Long]("chunk_len"),
        r.getAs[String]("chunk_text")))
    val byDoc = rows.groupBy(_._1)
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(byDoc.size == nDocs, "every doc yields at least one chunk")
    byDoc.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 == 0, s"doc $doc first chunk must start at 0")
      sorted.foreach { case (_, idx, start, len, text) =>
        assert(start == idx * 48, s"doc $doc chunk $idx start")
        assert(len >= 1 && len <= 64, s"doc $doc chunk $idx len $len")
        assert(text.split(" ", -1).length == len,
          s"doc $doc chunk $idx text/token-count mismatch")
      }
      sorted.init.foreach { case (_, idx, _, len, _) =>
        assert(len == 64, s"doc $doc non-final chunk $idx must be full-width")
      }
      // tail chunk reaches the end of the doc, and (when there are
      // overflow chunks) strictly advances past the previous window
      val (_, _, lastStart, lastLen, _) = sorted.last
      if (sorted.length > 1) assert(lastStart + lastLen > sorted.init.last._3 + 48)
    }
  }

  test("pii_redaction: planted patterns are counted and fully removed") {
    val emailRe = graft.queries.PackingQueries.EmailRe
    val phoneRe = graft.queries.PackingQueries.PhoneRe
    val out = SparkEntry.queries("pii_redaction")(spark, sf)
    assert(out.filter(col("n_emails") < 1 || col("n_phones") < 1).count() == 0,
      "every doc carries at least the planted email + phone")
    // recompute the redacted text with the same expressions and assert
    // nothing matching either pattern survives
    val aug = concat(col("text"), lit(" contact user"),
      col("doc_id").cast("string"), lit("@example.com or +1 (555) 0"),
      col("doc_id").cast("string"))
    val survivors = graft.sources.Tables.documents(spark, sf)
      .select(regexp_replace(regexp_replace(aug, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>").as("red"))
      .filter(col("red").rlike(emailRe) || col("red").rlike(phoneRe))
      .count()
    assert(survivors == 0, "redacted text must contain no matchable PII")
  }
}
