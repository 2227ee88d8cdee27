package graft

import graft.sources.{IvfIndexStore, Tables}
import graft.streaming.{EmbeddingIngestStream, SemanticGateStream}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed vector ingest (semantic gate + IVF maintenance in one
  * pass) vs its two batch ground truths: the quarantine equals the
  * batch decontaminate_semantic verdicts, the index equals a one-shot
  * build over exactly the clean set — so a benchmark-adjacent vector
  * can never be served — and a redelivered batch is a no-op on both
  * sides. */
object StreamingEmbeddingIngestSpec {
  case class Vec(vec_id: Long, emb: Seq[Double])
}

class StreamingEmbeddingIngestSpec extends AnyFunSuite {
  import StreamingEmbeddingIngestSpec.Vec

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def vecs: DataFrame =
    Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  private def pivots: DataFrame =
    vecs.filter(col("vec_id") < 16)
      .select(col("vec_id").as("pid"), col("emb").as("pemb"))

  private def evalSet = vecs.filter(col("vec_id") % 10 === 0)
    .select(col("vec_id").as("eval_id"), col("emb").as("eemb"))
  private def trainVecs = vecs.filter(col("vec_id") % 10 =!= 0)

  private def cellSet(prefix: String): Set[(Long, Long)] =
    IvfIndexStore.read(spark, prefix).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("composed ingest: quarantine = batch verdicts, index = one-shot build over the clean set") {
    import spark.implicits._
    val (inc, clean) = ("emb_ingest_inc", "emb_ingest_clean")
    val contamDir = tmp("ei_contam")
    Seq(inc, clean).foreach(IvfIndexStore.drop(spark, _))
    try {
      IvfIndexStore.init(spark, pivots, inc, buckets = 8)
      IvfIndexStore.init(spark, pivots, clean, buckets = 8)

      val batchVerdicts = SparkEntry.queries("decontaminate_semantic")(spark, sf)
      val contamIds = batchVerdicts.filter(col("contaminated"))
        .select(col("vec_id")).as[Long].collect().toSet
      assert(contamIds.nonEmpty, "fixture must exercise the contamination path")

      // ground-truth index: one-shot build over exactly the clean set
      IvfIndexStore.upsertBatch(spark,
        trainVecs.filter(!col("vec_id").isInCollection(contamIds)), clean, 8)

      val rows = trainVecs.as[Vec].collect()
      val ms = MemoryStream[Vec](spark)
      val q = EmbeddingIngestStream
        .writer(ms.toDF(), evalSet, 0.3, contamDir, inc, buckets = 8)
        .option("checkpointLocation", tmp("ei_ckpt"))
        .queryName("ei_converge").start()
      try rows.grouped(math.max(1, rows.length / 3)).foreach { c =>
        ms.addData(c.toSeq); q.processAllAvailable()
      } finally q.stop()

      assert(spark.read.parquet(contamDir).select(col("vec_id"))
        .as[Long].collect().toSet == contamIds)
      assert(cellSet(inc) == cellSet(clean))
      assert(cellSet(inc).size == rows.length - contamIds.size,
        "index holds exactly the admitted vectors")
    } finally Seq(inc, clean).foreach(IvfIndexStore.drop(spark, _))
  }

  test("composed ingest also maintains PQ codes when codebooks are frozen at the prefix") {
    import spark.implicits._
    val (inc, clean) = ("emb_pq_inc", "emb_pq_clean")
    val contamDir = tmp("eipq_contam")
    Seq(inc, clean).foreach(IvfIndexStore.drop(spark, _))
    try {
      // freeze pivots AND codebooks before the stream starts (both
      // trained on the same frame so the two stores share codebooks)
      Seq(inc, clean).foreach { p =>
        IvfIndexStore.init(spark, pivots, p, buckets = 8)
        IvfIndexStore.initPq(spark, vecs, p, buckets = 8)
      }
      val contamIds = SparkEntry.queries("decontaminate_semantic")(spark, sf)
        .filter(col("contaminated")).select(col("vec_id")).as[Long].collect().toSet
      val cleanVecs = trainVecs.filter(!col("vec_id").isInCollection(contamIds))
      IvfIndexStore.upsertBatch(spark, cleanVecs, clean, 8)
      IvfIndexStore.upsertPqBatch(spark, cleanVecs, clean, 8)

      val rows = trainVecs.as[Vec].collect()
      val ms = MemoryStream[Vec](spark)
      val q = EmbeddingIngestStream
        .writer(ms.toDF(), evalSet, 0.3, contamDir, inc, buckets = 8)
        .option("checkpointLocation", tmp("eipq_ckpt"))
        .queryName("eipq_converge").start()
      try rows.grouped(math.max(1, rows.length / 3)).foreach { c =>
        ms.addData(c.toSeq); q.processAllAvailable()
      } finally q.stop()

      def codeSet(p: String): Set[(Long, Int, Long)] =
        graft.sources.BucketedUpsert.read(spark, IvfIndexStore.codesTable(p))
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(cellSet(inc) == cellSet(clean))
      assert(codeSet(inc) == codeSet(clean),
        "streamed code maintenance must equal the one-shot encode of the clean set")
      assert(codeSet(inc).size ==
        (rows.length - contamIds.size) * graft.operators.PqFp.M,
        "every admitted vector encoded exactly once per subspace; no quarantined code")
    } finally Seq(inc, clean).foreach(IvfIndexStore.drop(spark, _))
  }

  test("redelivered batch is a no-op on both the index and the quarantine") {
    import spark.implicits._
    val inc = "emb_ingest_replay"
    val contamDir = tmp("ei_contam2")
    IvfIndexStore.drop(spark, inc)
    try {
      IvfIndexStore.init(spark, pivots, inc, buckets = 8)
      val probes = SemanticGateStream.evalProbes(evalSet)
      val chunk = trainVecs.limit(60).toDF()
      EmbeddingIngestStream.processBatch(chunk, probes, 0.3, contamDir, inc, 8, 3L)
      val once = (cellSet(inc), spark.read.parquet(contamDir).count())
      EmbeddingIngestStream.processBatch(chunk, probes, 0.3, contamDir, inc, 8, 3L)
      val twice = (cellSet(inc), spark.read.parquet(contamDir).count())
      assert(once == twice)
      assert(once._1.size + once._2 == 60)
    } finally IvfIndexStore.drop(spark, inc)
  }
}
