package graft

import graft.operators.{Expectation, Expectations}
import graft.sources.Tables
import graft.streaming.QualityGateStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming quality gate vs its batch ground truth: chunked feed
  * ≡ batch split, per-batch observe counters sum to the batch audit,
  * and a redelivered batch overwrites rather than appends. */
object StreamingQualityGateSpec {
  case class Doc(doc_id: Long, text: String, n_chars: Long)
}

class StreamingQualityGateSpec extends AnyFunSuite {
  import StreamingQualityGateSpec.Doc

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // calibrated on the fixture: 58 of 500 docs fail (both gates bite)
  private val checks = Seq(
    Expectation("min_tokens_12", size(split(trim(col("text")), " ")) >= 12),
    Expectation("max_chars_500", col("n_chars") <= 500))

  private def fixtureDocs = Tables.documents(spark, sf)
    .select(col("doc_id"), col("text"), col("n_chars"))

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("chunked stream reproduces the batch split; observe counters sum to the batch audit") {
    import spark.implicits._
    val (cleanDir, quarDir) = (tmp("qg_clean"), tmp("qg_quar"))
    val docs = fixtureDocs.as[Doc].collect()
    val ms = MemoryStream[Doc](spark)
    val q = QualityGateStream.writer(ms.toDF(), checks, cleanDir, quarDir)
      .option("checkpointLocation", tmp("qg_ckpt"))
      .queryName("qg_converge").start()
    try {
      docs.grouped(math.max(1, docs.length / 3)).foreach { chunk =>
        ms.addData(chunk.toSeq); q.processAllAvailable()
      }

      val (cleanBatch, quarBatch) = Expectations.split(fixtureDocs, checks)
      val gotClean = QualityGateStream.clean(spark, cleanDir)
        .select(col("doc_id")).as[Long].collect().sorted
      val wantClean = cleanBatch.select(col("doc_id")).as[Long].collect().sorted
      assert(gotClean.sameElements(wantClean))
      assert(gotClean.length + QualityGateStream.quarantined(spark, quarDir).count()
        == docs.length)

      // quarantine rows carry the SAME violation lists batch annotate
      // assigns (name order pinned by declaration order)
      val gotQuar = QualityGateStream.quarantined(spark, quarDir)
        .select(col("doc_id"), concat_ws(",", col("violations")).as("v"))
        .as[(Long, String)].collect().toMap
      val wantQuar = quarBatch
        .select(col("doc_id"), concat_ws(",", col("violations")).as("v"))
        .as[(Long, String)].collect().toMap
      assert(gotQuar == wantQuar)

      // per-batch observed counters, summed, equal the batch audit
      val perBatch = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("expectations")))
      assert(perBatch.nonEmpty, "no observed metrics in progress")
      val gotCounts = Map(
        "n_rows" -> perBatch.map(_.getAs[Long]("n_rows")).sum,
        "min_tokens_12" -> perBatch.map(_.getAs[Long]("failed_min_tokens_12")).sum,
        "max_chars_500" -> perBatch.map(_.getAs[Long]("failed_max_chars_500")).sum)
      val audit = Expectations.audit(fixtureDocs, checks).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(gotCounts("n_rows") == audit("min_tokens_12")._1)
      assert(gotCounts("min_tokens_12") == audit("min_tokens_12")._2)
      assert(gotCounts("max_chars_500") == audit("max_chars_500")._2)
      assert(gotCounts("min_tokens_12") > 0 && gotCounts("max_chars_500") > 0,
        "fixture must exercise both checks")
    } finally q.stop()
  }

  test("redelivered batch overwrites its own directories — no duplicate rows") {
    import spark.implicits._
    val (cleanDir, quarDir) = (tmp("qg_replay_c"), tmp("qg_replay_q"))
    val batch = fixtureDocs.as[Doc].collect().take(100).toSeq.toDF()
    QualityGateStream.writeBatch(batch, checks, cleanDir, quarDir, id = 7L)
    val firstClean = QualityGateStream.clean(spark, cleanDir).count()
    val firstQuar = QualityGateStream.quarantined(spark, quarDir).count()
    assert(firstClean + firstQuar == 100)

    QualityGateStream.writeBatch(batch, checks, cleanDir, quarDir, id = 7L)
    assert(QualityGateStream.clean(spark, cleanDir).count() == firstClean)
    assert(QualityGateStream.quarantined(spark, quarDir).count() == firstQuar)
  }
}
